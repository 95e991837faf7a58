"""Pallas level-2 tier registry.

On TPU the compiled Mosaic kernels are used; on CPU (tests, dev boxes) the
same kernels run through the Pallas interpreter so the exact kernel code is
validated everywhere.  Disable the whole tier with GIP_TPU_DISABLE_PALLAS=1
(the XLA-fused tier in ops/fused.py then serves level 2).
"""

from __future__ import annotations

from typing import Callable

from ...runtime.device import is_tpu


def _box_routed(img, radius: int, interpret: bool, folded: bool):
    """Box blur with a VMEM feasibility gate: box has no radius cap
    (reference parity), and past a radius in the low hundreds even the
    column-chunked Pallas working set exceeds VMEM -- those calls serve
    from the XLA-fused tier (bit-identical numerics).

    Every tier here is BIT-EXACT, so the MXU box (0.36-0.86x the VPU
    doubling-window kernel on v5e, scripts/exp_box_mxu.py) serves level 2
    AND level 4 -- routing only changes speed."""
    from ..fused import box_fused
    from .blur import blur_pallas_feasible, box_pallas
    from .blur_mxu import box_mxu, use_mxu_box

    # MXU first: at extreme radii the VPU sequenced-tap working set can
    # exceed VMEM while the MXU kernel still fits (its own feasibility
    # lives inside use_mxu_box) -- gating on the VPU model first would
    # demote those to the XLA tier (same ordering as _rows_optimized).
    if use_mxu_box(radius, img.shape[1], img.shape[2], interleaved=False):
        return box_mxu(img, radius, interpret=interpret)
    if not blur_pallas_feasible(img.shape[1], radius, img.shape[2],
                                box_mode=True, interleaved=False):
        return box_fused(img, radius)
    return box_pallas(img, radius, interpret=interpret, folded=folded)


def level2_impls() -> dict[str, Callable]:
    from .blur import gaussian_pallas
    from .sobel import sobel_pallas

    interpret = not is_tpu()
    return {
        "gaussian": lambda img, w, radius: gaussian_pallas(
            img, w, radius, interpret=interpret
        ),
        "box": lambda img, radius: _box_routed(
            img, radius, interpret=interpret, folded=False),
        "sobel": lambda img: sobel_pallas(img, interpret=interpret),
    }


def _gaussian_adv(img, w, radius: int, interpret: bool):
    """ADVANCED gaussian: MXU banded-matmul kernel at radius >=
    GAUSS_MXU_MIN_RADIUS (nearly radius-flat cost; ~2x the VPU at r=6-8,
    2.6-3.4x at r=15), symmetric-folded VPU taps below it."""
    from .blur import gaussian_pallas
    from .blur_mxu import gaussian_mxu, use_mxu_gaussian

    if use_mxu_gaussian(radius, img.shape[1], img.shape[2],
                        interleaved=False):
        return gaussian_mxu(img, w, radius, interpret=interpret)
    return gaussian_pallas(img, w, radius, interpret=interpret, folded=True)


def level4_impls() -> dict[str, Callable]:
    """ADVANCED tier: relaxed accumulation order (maxdiff <= 1 vs level 2)."""
    from .sobel import sobel_pallas

    interpret = not is_tpu()
    return {
        "gaussian": lambda img, w, radius: _gaussian_adv(
            img, w, radius, interpret
        ),
        "box": lambda img, radius: _box_routed(
            img, radius, interpret=interpret, folded=True),
        # Advanced sobel skips the tile-load gray quantization (f32 gray):
        # the level-1 numerics through the fused kernel, which measured
        # ~30% faster than the quantized level-2 path on v5e.
        "sobel": lambda img: sobel_pallas(img, level=1, interpret=interpret),
    }
