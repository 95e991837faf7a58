"""Batch data-parallel filtering: shard a stack of images across chips.

The reference processes one image per request on one GPU
(`/api/process-all` even iterates levels serially, backend/app.py:332).
On TPU the natural serving-scale path is a batch of same-shape images laid
out (B, H, W, C) and sharded over the `dp` mesh axis; XLA inserts no
collectives at all (pure data parallelism), so throughput scales linearly
over ICI-connected chips.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import fused, ref


def make_batch_filter(mesh: Mesh, filter_name: str, radius: int = 3, level: int = 2):
    """Jitted batch filter with the batch dim sharded over EVERY mesh axis.

    Input (B, H, W, C) uint8, B divisible by the total device count.
    """
    axes = tuple(mesh.axis_names)
    spec = P(axes, None, None, None)
    sharding = NamedSharding(mesh, spec)
    rep = NamedSharding(mesh, P())

    if filter_name == "gaussian":
        impl = ref.gaussian_blur if level == 1 else fused.gaussian_fused

        def fn(imgs, weights):
            return jax.vmap(lambda im: impl(im, weights, radius))(imgs)

        return jax.jit(fn, in_shardings=(sharding, rep), out_shardings=sharding)

    if filter_name == "box":
        impl = ref.box_blur if level == 1 else fused.box_fused

        def fn(imgs):
            return jax.vmap(lambda im: impl(im, radius))(imgs)

        return jax.jit(fn, in_shardings=(sharding,), out_shardings=sharding)

    if filter_name == "sobel":
        def fn(imgs):
            return jax.vmap(lambda im: ref.sobel(im, level))(imgs)

        return jax.jit(fn, in_shardings=(sharding,), out_shardings=sharding)

    raise ValueError(f"Unknown filter: {filter_name}")
