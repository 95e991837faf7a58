#!/usr/bin/env python3
"""A/B: host-side lane/row pre-pad vs the in-program pad prologue.

VERDICT r4 item 1: the gaussian L2 program's ~0.1 ms pad op exists only
because the device executable receives unpadded input.  Padding on the
HOST (numpy, next to the untimed H2D -- the reference also excludes its
cudaMemcpy from kernel timing, image_filters.cu:679-804) deletes the pad
op -- and, on the planar/library path, the HWC->planar transpose too --
leaving a device program that is the Pallas kernel (+ out-transpose for
the planar arm).

Arms (interleaved within each round; only within-round ratios count on
this 2.7x-drift multi-tenant chip; CLAUDE.md measurement discipline):

  planar (bench gaussian L2 configuration, r=3):
    A        gaussian_pallas(hwc)        -- in-transpose + pad + kernel
                                            + out-transpose (current)
    B        kernel(host-prepadded) + DUS-chain (loop-carry write; an
             UPPER bound on the kernel-only program)
    DUS-only the chaining write alone (decomposition)
  rows (serving configuration):
    A  gaussian_pallas_rows(rows)           -- pad + kernel (current)
    B  prepadded kernel + DUS-chain

Bit-exactness is gated ON DEVICE before timing (compare on device, fetch
the scalar -- bulk D2H through the relay is ~0.1-0.2 MB/s).

Usage: exp_host_prepad.py [rounds=5]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W, C = 2146, 3239, 3
RADIUS = 3
SIGMA = 2.0
ITERS = 64

# CPU dry-run support (tiny shapes, interpret-mode kernels): catches
# harness shape bugs without burning a TPU window.
INTERP = os.environ.get("GIP_EXP_INTERPRET") == "1"


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import jax
    import jax.numpy as jnp

    from gpu_image_processing_tpu.ops.pallas.blur import (
        _separable_blur_planar,
        gaussian_pallas,
        gaussian_pallas_rows,
        host_prepad_planar,
        host_prepad_rows,
    )
    from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32
    from gpu_image_processing_tpu.runtime.device import (
        default_device,
        warmup_transfers,
    )
    from gpu_image_processing_tpu.runtime.timing import device_time_ms

    warmup_transfers()
    dev = default_device()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (H, W, C), dtype=np.uint8)
    w_np = gaussian_kernel_f32(RADIUS, SIGMA)

    planar_np = np.ascontiguousarray(img.transpose(2, 0, 1))
    xp_np = host_prepad_planar(planar_np, RADIUS, box_mode=False)
    rows_np = img.reshape(H, W * C)
    xr_np = host_prepad_rows(rows_np, RADIUS, C, box_mode=False)
    print(f"planar prepad shape {xp_np.shape} (+"
          f"{xp_np.nbytes / planar_np.nbytes - 1:.2%} bytes); "
          f"rows prepad shape {xr_np.shape} (+"
          f"{xr_np.nbytes / rows_np.nbytes - 1:.2%})")

    x_hwc = jax.device_put(jnp.asarray(img), dev)
    x_pp = jax.device_put(jnp.asarray(xp_np), dev)
    x_rows = jax.device_put(jnp.asarray(rows_np), dev)
    x_rpp = jax.device_put(jnp.asarray(xr_np), dev)
    w = jax.device_put(jnp.asarray(w_np), dev)

    from gpu_image_processing_tpu.ops.pallas.blur import _LAND, _blur_plan

    land_p = _blur_plan(H, W, C, RADIUS, False, interleaved=False)[0]
    land_r = _blur_plan(H, W * C, C, RADIUS, False, interleaved=True)[0]

    f_a = jax.jit(lambda x, wt: gaussian_pallas(x, wt, RADIUS, interpret=INTERP))

    def _prepad_body(xq, wt):
        out = _separable_blur_planar(xq, wt, RADIUS, box_mode=False,
                                     interpret=INTERP,
                                     host_prepadded=(H, W))
        return jnp.transpose(out, (1, 2, 0))

    f_b = jax.jit(_prepad_body)
    f_ra = jax.jit(lambda x, wt: gaussian_pallas_rows(x, wt, RADIUS, C, interpret=INTERP))
    f_rb = jax.jit(lambda x, wt: gaussian_pallas_rows(
        x, wt, RADIUS, C, interpret=INTERP, host_prepadded=(H, W * C)))

    # Loop-chained (shape-preserving) variants for device_time_ms: the
    # prepad arms' output is written back into the padded carry with a
    # dynamic_update_slice (in serving, that write is the next request's
    # H2D, untimed) -- so the timed prepad loop body is kernel + one
    # full-image DUS, an UPPER bound on the kernel-only program.  A
    # DUS-only arm measures the chaining overhead for decomposition.
    # CORNER chaining: run 3 taught that any full-image chain write is a
    # 0.33-0.92 ms relayout that swamps the effect.  A custom-call cannot
    # be partially dead-code-eliminated, so writing just an 8x128 CORNER
    # of the kernel output back into the carry forces the whole kernel to
    # execute while the chain itself is a ~1 KB aligned write.  The
    # corner-DUS-only arm confirms the chain cost is negligible.
    def _corner(xq, out):
        ch = min(8, out.shape[-2])
        cw = min(128, out.shape[-1])
        tile = jax.lax.slice(out, (0,) * out.ndim,
                             (1,) * (out.ndim - 2) + (ch, cw))
        return jax.lax.dynamic_update_slice(xq, tile, (0,) * xq.ndim)

    def _b_loop(xq, wt):
        out = _separable_blur_planar(xq, wt, RADIUS, box_mode=False,
                                     interpret=INTERP,
                                     host_prepadded=(H, W))
        return _corner(xq, out)

    def _dus_loop(xq, wt):
        # XOR keeps the write non-elidable (add-zero would fold away).
        tile = jax.lax.slice(
            xq, (0, 0, 0),
            (1, min(8, H), min(128, xq.shape[-1]))) ^ jnp.uint8(1)
        return jax.lax.dynamic_update_slice(xq, tile, (0, 0, 0))

    def _rb_loop(xr, wt):
        out = gaussian_pallas_rows(xr, wt, RADIUS, C, interpret=INTERP,
                                   host_prepadded=(H, W * C))
        return _corner(xr, out)

    def _rdus_loop(xr, wt):
        tile = jax.lax.slice(
            xr, (0, 0), (min(8, H), min(128, xr.shape[-1]))) ^ jnp.uint8(1)
        return jax.lax.dynamic_update_slice(xr, tile, (0, 0))

    # Sobel serving tier (rows MXU, the tier where %pad.0 measured 24.6%
    # of traced time -- benchmarks/sol_report.json): same A/B shape.
    from gpu_image_processing_tpu.ops.pallas.sobel_mxu import (
        host_prepad_rows_mxu,
        sobel_mxu_rows,
    )

    xs_np = host_prepad_rows_mxu(rows_np, W, C)
    x_spp = jax.device_put(jnp.asarray(xs_np), dev)
    f_sa = jax.jit(lambda x, wt: sobel_mxu_rows(x, W, C, level=2, interpret=INTERP))
    f_sb = jax.jit(lambda x, wt: sobel_mxu_rows(
        x, W, C, level=2, interpret=INTERP, host_prepadded=(H, W * C)))

    def _sb_loop(xs, wt):
        out = sobel_mxu_rows(xs, W, C, level=2, interpret=INTERP,
                             host_prepadded=(H, W * C))
        return _corner(xs, out)

    # Bit-exactness gates, compared on device.
    ref = f_a(x_hwc, w)
    d1 = int(jnp.abs(ref.astype(jnp.int32)
                     - f_b(x_pp, w).astype(jnp.int32)).max())
    ref_r = f_ra(x_rows, w)
    d2 = int(jnp.abs(ref_r.astype(jnp.int32)
                     - f_rb(x_rpp, w).astype(jnp.int32)).max())
    d3 = int(jnp.abs(f_sa(x_rows, w).astype(jnp.int32)
                     - f_sb(x_spp, w).astype(jnp.int32)).max())
    print(f"gate: planar prepad maxdiff {d1}, rows prepad maxdiff {d2}, "
          f"sobel-mxu prepad maxdiff {d3}")
    if d1 or d2 or d3:
        print("FAIL: prepad output differs")
        return 1

    arms = [
        ("planar A (current)", f_a, (x_hwc, w)),
        ("planar B (prepad+DUS)", _b_loop, (x_pp, w)),
        ("planar DUS-only", _dus_loop, (x_pp, w)),
        ("rows A (current)", f_ra, (x_rows, w)),
        ("rows B (prepad+DUS)", _rb_loop, (x_rpp, w)),
        ("rows DUS-only", _rdus_loop, (x_rpp, w)),
        ("sobel-mxu A (current)", f_sa, (x_rows, w)),
        ("sobel-mxu B (prepad+DUS)", _sb_loop, (x_spp, w)),
    ]
    results = {name: [] for name, _, _ in arms}
    for r in range(rounds):
        line = []
        for name, fn, args in arms:
            t = device_time_ms(lambda a, b, fn=fn: fn(a, b), args,
                               iters=ITERS)
            results[name].append(t)
            line.append(f"{name}: {t:.4f}")
        print(f"round {r}: " + "  ".join(line))

    med = {k: float(np.median(v)) for k, v in results.items()}
    print("\nmedians:")
    for k, v in med.items():
        print(f"  {k:34} {v:.4f} ms")
    for pair in (("planar B (prepad+DUS)", "planar A (current)"),
                 ("planar DUS-only", "planar A (current)"),
                 ("rows B (prepad+DUS)", "rows A (current)"),
                 ("rows DUS-only", "rows A (current)"),
                 ("sobel-mxu B (prepad+DUS)", "sobel-mxu A (current)")):
        ratios = [b / a for b, a in zip(results[pair[0]], results[pair[1]])]
        print(f"  {pair[0]} / {pair[1]}: per-round "
              f"{['%.3f' % x for x in ratios]} median "
              f"{np.median(ratios):.3f}")
    # DUS-subtracted kernel-only estimates, per round (same window).
    for b_, d_, a_ in (("planar B (prepad+DUS)", "planar DUS-only",
                        "planar A (current)"),
                       ("rows B (prepad+DUS)", "rows DUS-only",
                        "rows A (current)"),
                       ("sobel-mxu B (prepad+DUS)", "rows DUS-only",
                        "sobel-mxu A (current)")):
        est = [(b - d) / a for b, d, a in
               zip(results[b_], results[d_], results[a_])]
        print(f"  ({b_} - {d_}) / {a_}: per-round "
              f"{['%.3f' % x for x in est]} median {np.median(est):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
