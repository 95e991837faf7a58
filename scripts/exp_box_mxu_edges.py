#!/usr/bin/env python3
"""Box-MXU routing edges: r=1, the small-image XLA crossover, and G.

Follow-ups to scripts/exp_box_mxu.py (which set BOX_MXU_MIN_RADIUS=2 and
routed box L2/L4 to the MXU from r=2 up at README scale):

1. r=1 planar+rows — the one radius the first A/B left unmeasured.  If
   the MXU wins there too, BOX_MXU_MIN_RADIUS drops to 1 (all tiers are
   bit-exact, so routing is purely a speed decision).
2. Small images — config.TPU.box_xla_tier_max_pixels (1 MP) was measured
   against the VPU doubling kernel; the MXU tier is ~2x faster, so the
   crossover may have moved down.  Arms: XLA interleaved rows tier vs
   MXU rows at ~0.26 MP and ~0.84 MP, r in {2, 5}.
3. G-block — the box band does HALF the gaussian tier's FLOPs (no hi/lo
   split), so the measured G=128 optimum for gaussian
   (scripts/exp_mxu_gblock.py) may not transfer.  Arms: G=128 vs G=256
   planar r=5/15 at README scale.

Drift discipline (CLAUDE.md): all arms interleaved in ONE process,
slope-based device timing, medians across rounds, <30% noise.

Usage: exp_box_mxu_edges.py [rounds=5]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
SMALL = ((480, 540), (768, 1092))  # ~0.26 MP, ~0.84 MP (below the 1 MP gate)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax
    import jax.numpy as jnp

    from gpu_image_processing_tpu.ops import interleaved as il
    from gpu_image_processing_tpu.ops.pallas import blur as nblur
    from gpu_image_processing_tpu.ops.pallas import blur_mxu as M
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    print(f"device: {default_device()}  _G={M._G}", flush=True)

    rng = np.random.default_rng(13)
    img = jax.device_put(
        rng.integers(0, 256, size=(H, W, C), dtype=np.uint8),
        default_device())
    rows = jax.device_put(
        rng.integers(0, 256, size=(H, W * C), dtype=np.uint8),
        default_device())
    small_rows = {
        (h, w): jax.device_put(
            rng.integers(0, 256, size=(h, w * C), dtype=np.uint8),
            default_device())
        for h, w in SMALL
    }

    def mxu_g(r, g):
        w8, scale = M._box_operands(r)
        return lambda x: jnp.transpose(
            M._gaussian_mxu(jnp.transpose(x, (2, 0, 1)), w8, r,
                            tap_stride=1, interpret=False, g_block=g,
                            box_scale=scale),
            (1, 2, 0))

    arms = []
    # 1. r=1 edges (README scale).
    arms.append(("vpu_planar_r1", lambda x: nblur.box_pallas(x, 1),
                 lambda x: nblur.box_pallas(x, 1), [img]))
    arms.append(("mxu_planar_r1", lambda x: M.box_mxu(x, 1),
                 lambda x: nblur.box_pallas(x, 1), [img]))
    arms.append(("vpu_rows_r1",
                 lambda x: nblur.box_pallas_rows(x, 1, C),
                 lambda x: nblur.box_pallas_rows(x, 1, C), [rows]))
    arms.append(("mxu_rows_r1", lambda x: M.box_mxu_rows(x, 1, C),
                 lambda x: nblur.box_pallas_rows(x, 1, C), [rows]))
    # 2. Small-image crossover: served XLA tier vs MXU rows.
    for (h, w) in SMALL:
        sr = small_rows[(h, w)]
        for r in (2, 5):
            gate = (lambda r: lambda x: nblur.box_pallas_rows(x, r, C))(r)
            arms.append((
                f"xla_rows_{h}x{w}_r{r}",
                (lambda r: lambda x: il.box_rows(
                    x, r, C,
                    doubling=r >= il.BOX_DOUBLING_MIN_RADIUS_XLA))(r),
                gate, [sr]))
            arms.append((
                f"mxu_rows_{h}x{w}_r{r}",
                (lambda r: lambda x: M.box_mxu_rows(x, r, C))(r),
                gate, [sr]))
    # 3. G-block for the (half-FLOPs) box band.
    for r in (5, 15):
        gate = (lambda r: lambda x: nblur.box_pallas(x, r))(r)
        arms.append((f"mxu_g128_planar_r{r}", mxu_g(r, 128), gate, [img]))
        arms.append((f"mxu_g256_planar_r{r}", mxu_g(r, 256), gate, [img]))
    # 4. Upper crossover: box radius is UNCAPPED (core/params.py) and the
    # MXU band cost grows ~linearly with the halo while the VPU doubling
    # kernel grows as log2(taps) -- somewhere above r=15 the VPU should
    # win again; the answer sets BOX_MXU_MAX_RADIUS.
    for r in (31, 63):
        for layout, xs, mk_vpu, mk_mxu in (
            ("planar", [img],
             lambda r: lambda x: nblur.box_pallas(x, r),
             lambda r: lambda x: M.box_mxu(x, r)),
            ("rows", [rows],
             lambda r: lambda x: nblur.box_pallas_rows(x, r, C),
             lambda r: lambda x: M.box_mxu_rows(x, r, C)),
        ):
            gate = mk_vpu(r)
            arms.append((f"vpu_{layout}_r{r}", mk_vpu(r), gate, xs))
            arms.append((f"mxu_{layout}_r{r}", mk_mxu(r), gate, xs))

    live = []
    for name, fn, gate_fn, args in arms:
        try:
            got = jax.jit(fn)(*args)
            want = jax.jit(gate_fn)(*args)
            d = int(jnp.abs(got.astype(jnp.int32)
                            - want.astype(jnp.int32)).max())
        except Exception as exc:
            print(f"{name}: build/run failed: {str(exc)[:200]}", flush=True)
            continue
        print(f"{name}: maxdiff {d} vs exact VPU box", flush=True)
        if d != 0:  # box tiers are BIT-exact; any diff disqualifies
            continue
        live.append((name, fn, args))

    samples: dict = {}
    for rd in range(rounds):
        for name, fn, args in live:
            small = any(f"{h}x{w}" in name for (h, w) in SMALL)
            iters = 64 if small else 32
            t = device_time_ms(fn, args, iters=iters, sync_reps=2)
            samples.setdefault(name, []).append(t)
            print(f"round {rd} {name}: {t:.4f} ms", flush=True)

    print("\n=== medians ===", flush=True)
    meds = {n: float(np.median(v)) for n, v in samples.items()}
    for name, med in meds.items():
        print(f"{name}: {med:.4f} ms", flush=True)
    for layout in ("planar", "rows"):
        for r in (1, 31, 63):
            a = meds.get(f"mxu_{layout}_r{r}")
            b = meds.get(f"vpu_{layout}_r{r}")
            if a and b:
                print(f"r={r} {layout}: mxu/vpu = {a / b:.3f}x", flush=True)
    for (h, w) in SMALL:
        for r in (2, 5):
            a = meds.get(f"mxu_rows_{h}x{w}_r{r}")
            b = meds.get(f"xla_rows_{h}x{w}_r{r}")
            if a and b:
                print(f"{h}x{w} r={r}: mxu/xla = {a / b:.3f}x", flush=True)
    for r in (5, 15):
        a = meds.get(f"mxu_g256_planar_r{r}")
        b = meds.get(f"mxu_g128_planar_r{r}")
        if a and b:
            print(f"G r={r}: g256/g128 = {a / b:.3f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
