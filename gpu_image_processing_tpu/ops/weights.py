"""Gaussian weight generation, bit-matched to the CUDA host helper.

`generateGaussianKernel` (cuda_lib/src/image_filters.cu:25-48) computes, in
float32 throughout:

    value[i] = expf(-(x*x) / (2.0f * sigma * sigma)),  x = float(i), i=-r..r
    sum      = sequential accumulation over i = -r..r
    kernel[i] /= sum

We replicate the same float32 operation order with numpy so the weight table
is bit-identical (modulo at most 1 ulp in expf) to the one the CUDA kernels
consume from constant memory.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=256)
def gaussian_kernel_f32(radius: int, sigma: float) -> np.ndarray:
    """Normalized 1-D Gaussian taps, shape (2*radius+1,), float32."""
    sigma32 = np.float32(sigma)
    two = np.float32(2.0)
    denom = two * sigma32 * sigma32  # matches `2.0f * sigma * sigma`
    vals = []
    total = np.float32(0.0)
    for i in range(-radius, radius + 1):
        x = np.float32(i)
        v = np.float32(np.exp(np.float32(-(x * x)) / denom))
        vals.append(v)
        total = np.float32(total + v)
    out = np.array([np.float32(v / total) for v in vals], dtype=np.float32)
    out.setflags(write=False)
    return out


@functools.lru_cache(maxsize=64)
def box_kernel_f32(radius: int) -> np.ndarray:
    """Equal box weights: each tap is `1.0f / (2*radius+1)` in float32.

    The CUDA box kernels sum raw pixels then multiply by the f32 reciprocal
    (image_filters.cu:375-394); the separable apply functions here therefore
    take `inv_taps` as a post-sum scale rather than per-tap weights.
    """
    inv = np.float32(1.0) / np.float32(2 * radius + 1)
    out = np.full(2 * radius + 1, inv, dtype=np.float32)
    out.setflags(write=False)
    return out


def box_inv_taps_f32(radius: int) -> np.float32:
    return np.float32(1.0) / np.float32(2 * radius + 1)
