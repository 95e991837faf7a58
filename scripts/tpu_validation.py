#!/usr/bin/env python3
"""On-hardware validation matrix: every filter x level x channel count x
radius extreme, checked against the independent numpy oracle on the REAL
device (the CPU pytest suite runs the same kernels through the Pallas
interpreter; this script is the proof on silicon).

Gates:
  * gaussian/box (all levels) and grayscale sobel: EXACT equality.
  * color sobel: maxdiff <= 6 on <= 0.1% of pixels.  XLA contracts the
    Rec.601 mul-add chain into FMAs (as nvcc does for the CUDA reference);
    a gray value landing exactly on k+0.5 then rounds differently than the
    strict-order numpy oracle, shifting the 3x3 magnitude by up to ~6.
  * level 4 (ADVANCED): maxdiff <= 1 vs level 2.

Run: python scripts/tpu_validation.py   (takes several minutes: ~40 XLA
compiles; keep it the only TPU process).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Pin tier routing to Pallas: this script is the on-silicon proof of the
# Pallas kernels; the small validation images would otherwise route to the
# XLA tier (dispatch._rows_optimized).  One default-routing case runs below.
os.environ["GIP_TPU_XLA_TIER_MAX_PIXELS"] = "0"
# This script VALIDATES the accelerator: transient relay errors must
# fail the run, never silently demote it to CPU (the results would
# be recorded as on-silicon).
os.environ.setdefault("GIP_TPU_DEMOTE_AFTER", "0")


import oracle_numpy as oracle  # noqa: E402

from gpu_image_processing_tpu.ops.weights import gaussian_kernel_f32  # noqa: E402
from gpu_image_processing_tpu.runtime.device import warmup_transfers  # noqa: E402
from gpu_image_processing_tpu.runtime.dispatch import RUNTIME  # noqa: E402

FAILS = 0


def check(label: str, ok: bool, detail: str = "") -> None:
    global FAILS
    FAILS += not ok
    print(f"{label}: {'OK' if ok else 'MISMATCH ' + detail}", flush=True)


def main() -> int:
    t0 = time.time()
    warmup_transfers()
    print(f"[{time.time() - t0:.0f}s] device ready", flush=True)
    rng = np.random.default_rng(99)

    for c in (1, 3, 4):
        img = rng.integers(0, 256, (310, 421, c), np.uint8)
        for level in (1, 2):
            for radius, sigma in ((1, 0.5), (3, 2.0), (15, 8.0)):
                out, _ = RUNTIME.gaussian_blur(
                    img, sigma=sigma, radius=radius, level=level
                )
                want = oracle.gaussian_blur(
                    img, gaussian_kernel_f32(radius, sigma), radius
                )
                check(f"gauss c{c} L{level} r{radius}", (out == want).all())
            for radius in (1, 15):
                out, _ = RUNTIME.box_blur(img, radius=radius, level=level)
                check(
                    f"box   c{c} L{level} r{radius}",
                    (out == oracle.box_blur(img, radius)).all(),
                )
            out, _ = RUNTIME.sobel_edge_detection(img, level=level)
            want = oracle.sobel(img, level)
            diff = np.abs(out.astype(int) - want.astype(int))
            if c > 1:
                # FMA contraction of the Rec.601 chain (XLA and nvcc both
                # contract; the numpy oracle does not): grays landing on
                # k+0.5 may round differently -> magnitude shift <= ~6 on
                # a tiny fraction of pixels.
                ok = diff.max() <= 6 and (diff > 0).mean() <= 1e-3
                check(f"sobel c{c} L{level} (FMA gate)", ok,
                      f"max={diff.max()} frac={(diff > 0).mean():.1e}")
                # Within-pixel channel equality (cu:1311-1313) must hold
                # INDEPENDENTLY of the oracle gate: a per-phase
                # quantization-tie flip (one channel off by 1) would hide
                # inside maxdiff<=6/0.1%.  Guards the input-replicated
                # gray scheme against TPU-lowering contraction changes.
                check(f"sobel c{c} L{level} channels-equal",
                      bool((out == out[:, :, :1]).all()))
            else:
                check(f"sobel c{c} L{level}", diff.max() == 0, f"max={diff.max()}")

    # ADVANCED tier gates.
    img = rng.integers(0, 256, (310, 421, 3), np.uint8)
    l2, _ = RUNTIME.gaussian_blur(img, level=2)
    l4, _ = RUNTIME.gaussian_blur(img, level=4)
    check("gauss L4 gate<=1", np.abs(l2.astype(int) - l4.astype(int)).max() <= 1)
    b2, _ = RUNTIME.box_blur(img, radius=5, level=2)
    b4, _ = RUNTIME.box_blur(img, radius=5, level=4)
    check("box L4 gate<=1", np.abs(b2.astype(int) - b4.astype(int)).max() <= 1)
    # Benchmark-pooling precondition under ON-SILICON ROUTING: box L2 and
    # L4 at the bench radius must trace to the identical jaxpr with the
    # real-TPU tier registry active (run_benchmarks.py pools their timing
    # samples).  Historical note: this check originally hashed the lowered
    # module text and CAUGHT that fingerprint being per-trace
    # nondeterministic under Mosaic (pooling silently dead on silicon,
    # 2026-08-19); bench.program_fingerprint now hashes the jaxpr, which is
    # trace-deterministic -- so what this asserts is routing/trace identity,
    # not byte identity of the Mosaic lowering.
    import bench
    bench_img = np.zeros((bench.H, bench.W, bench.C), np.uint8)
    check("box L2/L4 bench fingerprints identical (on-TPU routing)",
          bench.program_fingerprint("box", 2, bench_img)
          == bench.program_fingerprint("box", 4, bench_img))
    # radius >= GAUSS_MXU_MIN_RADIUS routes the ADVANCED gaussian to the
    # MXU banded-matmul kernel (ops/pallas/blur_mxu.py).
    m2, _ = RUNTIME.gaussian_blur(img, sigma=4.0, radius=15, level=2)
    m4, _ = RUNTIME.gaussian_blur(img, sigma=4.0, radius=15, level=4)
    check("gauss L4 r15 (MXU) gate<=1",
          np.abs(m2.astype(int) - m4.astype(int)).max() <= 1)
    # MXU sobel tier (level-2 color rows; auto-routed on TPU): gate vs the
    # every-lane baseline kernel at a full-width serving shape.  The c3/c4
    # L2 oracle gates above already exercised the routed tier; this pins
    # the tier-vs-baseline delta to quantization-tie flips only.
    import jax as _jax

    from gpu_image_processing_tpu.ops.pallas.sobel import sobel_pallas_rows
    from gpu_image_processing_tpu.ops.pallas.sobel_mxu import (
        sobel_mxu_rows, use_mxu_sobel)

    check("sobel L2 MXU tier routed on silicon", use_mxu_sobel(3239, 3, 2))
    simg = rng.integers(0, 256, (96, 3239, 3), np.uint8).reshape(96, -1)
    a = np.asarray(_jax.jit(lambda r: sobel_mxu_rows(r, 3239, 3))(simg))
    bl = np.asarray(_jax.jit(
        lambda r: sobel_pallas_rows(r, 3239, 3, level=2))(simg))
    sd = np.abs(a.astype(int) - bl.astype(int))
    check("sobel L2 MXU vs baseline gate",
          sd.max() <= 6 and (sd > 0).mean() <= 1e-3,
          f"max={sd.max()} frac={(sd > 0).mean():.1e}")

    # ADVANCED (f32-gray) MXU sobel: routed for L4 color rows; gate vs the
    # every-lane level-1-numerics baseline is the ADVANCED maxdiff<=1
    # (only an isolated floor(mag+0.5) tie can flip, by exactly 1).
    check("sobel L4 MXU tier routed on silicon", use_mxu_sobel(3239, 3, 1))
    a4 = np.asarray(_jax.jit(
        lambda r: sobel_mxu_rows(r, 3239, 3, level=1))(simg))
    bl4 = np.asarray(_jax.jit(
        lambda r: sobel_pallas_rows(r, 3239, 3, level=1))(simg))
    sd4 = np.abs(a4.astype(int) - bl4.astype(int))
    check("sobel L4 MXU vs baseline gate<=1",
          sd4.max() <= 1 and (sd4 > 0).mean() <= 1e-3,
          f"max={sd4.max()} frac={(sd4 > 0).mean():.1e}")

    # Full-width radius-15 serving shape (the VMEM stack regression case:
    # the 31-tap rows kernel must pick a tile height that compiles).
    wide = rng.integers(0, 256, (96, 3239, 3), np.uint8)
    w2, _ = RUNTIME.gaussian_blur(wide, sigma=4.0, radius=15, level=2)
    check("gauss L2 r15 full-width rows bit-exact",
          np.array_equal(w2, oracle.gaussian_blur(
              wide, gaussian_kernel_f32(15, 4.0), 15)))

    # Batched path (native Pallas batching, not vmap).
    imgs = np.stack([rng.integers(0, 256, (64, 97, 3), np.uint8) for _ in range(4)])
    w = gaussian_kernel_f32(3, 2.0)
    out, m = RUNTIME.run_batch("gaussian", imgs, level=2, sigma=2.0, radius=3)
    check(
        "batch gauss L2",
        all((out[i] == oracle.gaussian_blur(imgs[i], w, 3)).all() for i in range(4)),
    )

    # Column-tiled kernel: 8K-wide box r15 (full-width tiles would blow
    # VMEM; the kernel splits the width into column chunks).
    img = rng.integers(0, 256, (48, 7680, 3), np.uint8)
    out, _ = RUNTIME.box_blur(img, radius=15, level=2)
    check("box 8K-wide r15 (column-tiled)",
          (out == oracle.box_blur(img, 15)).all())

    # Radius-aware box gate (round 4): under DEFAULT routing a 0.84 MP
    # image at an MXU-eligible radius serves the MXU tier (the 1 MP box
    # gate applies only to r=1 / legacy callers), bit-exact vs oracle.
    os.environ.pop("GIP_TPU_XLA_TIER_MAX_PIXELS", None)
    img = rng.integers(0, 256, (768, 1092, 3), np.uint8)
    out, _ = RUNTIME.box_blur(img, radius=5, level=2)
    check("box 0.84MP r5 (MXU via radius-aware gate)",
          (out == oracle.box_blur(img, 5)).all())
    # Extreme radius where only the MXU kernel fits VMEM (MXU-first
    # ordering): must serve and match, not demote to XLA silently -- the
    # routing itself is asserted by tests/test_bucketing.py; silicon
    # checks the kernel actually compiles and is exact at this geometry.
    img = rng.integers(0, 256, (64, 3239, 3), np.uint8)
    out, _ = RUNTIME.box_blur(img, radius=500, level=2)
    check("box r500 w3239 (MXU-only-feasible geometry)",
          (out == oracle.box_blur(img, 500)).all())
    os.environ["GIP_TPU_XLA_TIER_MAX_PIXELS"] = "0"

    # Default routing sanity: small image through the XLA tier on silicon.
    os.environ["GIP_TPU_XLA_TIER_MAX_PIXELS"] = "2500000"
    img = rng.integers(0, 256, (96, 133, 3), np.uint8)
    out, _ = RUNTIME.gaussian_blur(img, sigma=2.0, radius=3, level=2)
    want = oracle.gaussian_blur(img, gaussian_kernel_f32(3, 2.0), 3)
    check("gauss c3 L2 (xla tier, default routing)", (out == want).all())
    os.environ["GIP_TPU_XLA_TIER_MAX_PIXELS"] = "0"

    print(f"TOTAL FAILURES: {FAILS}", flush=True)
    return 1 if FAILS else 0


if __name__ == "__main__":
    sys.exit(main())
