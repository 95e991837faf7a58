"""Spatially-sharded filtering: image rows split across chips, halos over ICI.

This is the multi-chip generalization of the reference's shared-memory halo
tiles (boxBlurHorizontalShared's cooperative halo loads,
cuda_lib/src/image_filters.cu:489-513): there the halo comes from global
memory into one SM's shared memory; here each chip holds a contiguous band
of rows and the vertical pass's halo rows travel over ICI via
`jax.lax.ppermute`.  The horizontal pass is embarrassingly parallel (full
width is local); only the vertical pass exchanges `radius` rows with each
neighbor.  Global top/bottom edges use clamp-to-edge replication, matching
the single-chip semantics (image_filters.cu:129-134).

Numerics are identical to the level-1/level-2 single-chip path: f32 tap
order, uint8 quantization between separable passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.rounding import quantize_u8, quantize_u8_f32
from ..ops.weights import box_inv_taps_f32
from ..ops import ref


def exchange_halo_rows(x: jnp.ndarray, radius: int, axis_name: str = "sp",
                       axis: int = -2) -> jnp.ndarray:
    """Extend a local row-band with `radius` halo rows per side along `axis`.

    Interior shards receive neighbor rows via two ppermute rings; the global
    first/last shard replicate their own edge row (clamp-to-edge).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    hl = x.shape[axis]

    def rows(start, size):
        return jax.lax.slice_in_dim(x, start, start + size, axis=axis)

    top_rows = rows(0, radius)
    bot_rows = rows(hl - radius, radius)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # my bottom rows -> next shard
    bwd = [(i, (i - 1) % n) for i in range(n)]   # my top rows -> prev shard
    halo_top = jax.lax.ppermute(bot_rows, axis_name, fwd)   # from prev shard
    halo_bot = jax.lax.ppermute(top_rows, axis_name, bwd)   # from next shard
    edge_top = jnp.broadcast_to(rows(0, 1), top_rows.shape)
    edge_bot = jnp.broadcast_to(rows(hl - 1, 1), bot_rows.shape)
    halo_top = jnp.where(idx == 0, edge_top, halo_top)
    halo_bot = jnp.where(idx == n - 1, edge_bot, halo_bot)
    return jnp.concatenate([halo_top, x, halo_bot], axis=axis)


def _conv_valid_rows(x: jnp.ndarray, weights, radius: int) -> jnp.ndarray:
    """Weighted conv along axis -2 with NO padding (halo already attached)."""
    height = x.shape[-2] - 2 * radius
    acc = None
    for i in range(2 * radius + 1):
        term = x[..., i : i + height, :] * weights[i]
        acc = term if acc is None else acc + term
    return acc


def _sum_valid_rows(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    height = x.shape[-2] - 2 * radius
    acc = None
    for i in range(2 * radius + 1):
        term = x[..., i : i + height, :]
        acc = term if acc is None else acc + term
    return acc


def _conv_pass_last(x: jnp.ndarray, weights, radius: int) -> jnp.ndarray:
    """Clamp-to-edge weighted conv along the (fully local) width axis."""
    width = x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(radius, radius)], mode="edge")
    acc = None
    for i in range(2 * radius + 1):
        term = xp[..., i : i + width] * weights[i]
        acc = term if acc is None else acc + term
    return acc


def _sum_pass_last(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    width = x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(radius, radius)], mode="edge")
    acc = None
    for i in range(2 * radius + 1):
        term = xp[..., i : i + width]
        acc = term if acc is None else acc + term
    return acc


# ---------------------------------------------------------------------------
# Per-shard step bodies (run inside shard_map; x is the local block)
#
# Each shard exchanges RAW halo rows over ICI and then runs the same fused
# Pallas kernels as the single-chip path in rows-prepadded ("valid") mode.
# The horizontal pass is row-local and deterministic, so recomputing it on
# the halo rows yields exactly the values the neighbor shard computed --
# the sharded output is bit-identical to single-chip.  Set use_pallas=False
# (or run where Mosaic is unavailable) for the pure-jnp bodies.
# ---------------------------------------------------------------------------


def _use_interpret() -> bool:
    from ..runtime.device import is_tpu

    return not is_tpu()


def _gaussian_body(local_u8: jnp.ndarray, weights: jnp.ndarray, radius: int,
                   use_pallas: bool = True) -> jnp.ndarray:
    """local_u8: (B_local, H_local, W, C) -> same, gaussian-blurred."""
    if use_pallas:
        from ..ops.pallas.blur import _separable_blur_planar

        b, hl, width, c = local_u8.shape
        planar = jnp.transpose(local_u8, (0, 3, 1, 2)).reshape(b * c, hl, width)
        ext = exchange_halo_rows(planar, radius)          # (B*C, Hl+2r, W) u8
        out = _separable_blur_planar(
            ext, weights, radius, box_mode=False,
            interpret=_use_interpret(), rows_prepadded=True,
        )
        return jnp.transpose(out.reshape(b, c, hl, width), (0, 2, 3, 1))
    x = jnp.transpose(local_u8, (0, 3, 1, 2)).astype(jnp.float32)  # (B,C,Hl,W)
    h = quantize_u8_f32(_conv_pass_last(x, weights, radius))
    ext = exchange_halo_rows(h, radius)
    v = quantize_u8(_conv_valid_rows(ext, weights, radius))
    return jnp.transpose(v, (0, 2, 3, 1))


def _box_body(local_u8: jnp.ndarray, radius: int, use_pallas: bool = True) -> jnp.ndarray:
    if use_pallas:
        import numpy as _np

        from ..ops.pallas.blur import _separable_blur_planar

        b, hl, width, c = local_u8.shape
        inv = jnp.asarray(
            _np.full(2 * radius + 1, box_inv_taps_f32(radius), dtype=_np.float32)
        )
        planar = jnp.transpose(local_u8, (0, 3, 1, 2)).reshape(b * c, hl, width)
        ext = exchange_halo_rows(planar, radius)
        out = _separable_blur_planar(
            ext, inv, radius, box_mode=True,
            interpret=_use_interpret(), rows_prepadded=True,
        )
        return jnp.transpose(out.reshape(b, c, hl, width), (0, 2, 3, 1))
    inv = box_inv_taps_f32(radius)
    x = jnp.transpose(local_u8, (0, 3, 1, 2)).astype(jnp.float32)
    h = quantize_u8_f32(_sum_pass_last(x, radius) * inv)
    ext = exchange_halo_rows(h, radius)
    v = quantize_u8(_sum_valid_rows(ext, radius) * inv)
    return jnp.transpose(v, (0, 2, 3, 1))


def _zero_global_border_rows(out_u8: jnp.ndarray) -> jnp.ndarray:
    """Zero rows whose GLOBAL index is 0 or H-1 (image_filters.cu:1164).

    out_u8: (B, Hl, W, C); local row j is global row sp_index*Hl + j.
    Width borders are already zeroed per shard (W is fully local).
    """
    _, hl, _, _ = out_u8.shape
    n = jax.lax.axis_size("sp")
    idx = jax.lax.axis_index("sp")
    grow = idx * hl + jax.lax.broadcasted_iota(jnp.int32, (1, hl, 1, 1), 1)
    row_ok = (grow >= 1) & (grow <= n * hl - 2)
    return jnp.where(row_ok, out_u8, jnp.uint8(0))


def _sobel_body(local_u8: jnp.ndarray, level: int,
                use_pallas: bool = True) -> jnp.ndarray:
    """Sobel with distributed 1-row halo and global border zeroing."""
    b, hl, width, channels = local_u8.shape
    if use_pallas:
        from ..ops.pallas.sobel import sobel_pallas_batch

        ext = exchange_halo_rows(local_u8, 1, axis=-3)   # (B, Hl+2, W, C) u8
        out = sobel_pallas_batch(
            ext, level=level, interpret=_use_interpret(),
            rows_prepadded=True, zero_rows=False,
        )
        return _zero_global_border_rows(out)

    gray = ref.grayscale_f32(local_u8)           # (B, Hl, W)
    if level == 2:
        gray = quantize_u8_f32(gray)
    ext = exchange_halo_rows(gray, 1)            # (B, Hl+2, W)
    gp = jnp.pad(ext, ((0, 0), (0, 0), (1, 1)), mode="edge")  # width clamp

    def tap(dy: int, dx: int) -> jnp.ndarray:
        return gp[:, 1 + dy : 1 + dy + hl, 1 + dx : 1 + dx + width]

    one, two = jnp.float32(1.0), jnp.float32(2.0)
    gx = (
        (-one) * tap(-1, -1) + one * tap(-1, 1)
        + (-two) * tap(0, -1) + two * tap(0, 1)
        + (-one) * tap(1, -1) + one * tap(1, 1)
    )
    gy = (
        (-one) * tap(-1, -1) + (-two) * tap(-1, 0) + (-one) * tap(-1, 1)
        + one * tap(1, -1) + two * tap(1, 0) + one * tap(1, 1)
    )
    mag = jnp.minimum(jnp.sqrt(gx * gx + gy * gy), jnp.float32(255.0))
    out = quantize_u8(mag)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2)
    col_ok = (col >= 1) & (col <= width - 2)
    out = jnp.where(col_ok, out, jnp.uint8(0))
    out4 = jnp.broadcast_to(out[..., None], (b, hl, width, channels))
    return _zero_global_border_rows(out4)


# ---------------------------------------------------------------------------
# Public builders
# ---------------------------------------------------------------------------


def _specs(mesh: Mesh):
    batch_spec = P("dp", "sp", None, None)   # (B, H, W, C): B over dp, H over sp
    return batch_spec


def spatial_halo(filter_name: str, radius: int) -> int:
    """Halo rows each shard needs from its neighbor (sobel: 1; blurs: r)."""
    return 1 if filter_name == "sobel" else radius


def spatial_h_target(h: int, sp: int, filter_name: str, radius: int) -> int:
    """The mesh-divisible padded height `make_sharded_filter` computes.

    Exposed so callers that pre-pad on the HOST (runtime/dispatch.py's
    spatial serving, which must commit the operand already divisible so no
    in-graph pad/reshard lands in the timed program) use the SAME formula
    the in-graph pad would -- a divergence here would silently reintroduce
    the reshard into the measured call.
    """
    return sp * max(-(-h // sp), spatial_halo(filter_name, radius))


def make_sharded_filter(
    mesh: Mesh,
    filter_name: str,
    radius: int = 3,
    level: int = 2,
    use_pallas: bool = True,
):
    """Build a jitted (dp, sp)-sharded batch filter step.

    Input: any (B, H, W, C) uint8.  Gaussian additionally takes a (2r+1,)
    f32 weight vector (replicated).

    Shapes that don't tile the mesh (B % dp != 0, H % sp != 0, or fewer
    than `halo` rows per shard) are edge-padded up to the divisible shape,
    filtered, and cropped back -- the same pad-and-crop trick the
    single-chip runtime uses for shape bucketing (runtime/dispatch.py).
    Bit-exactness survives because edge padding replicates the clamp row:
    every tap an in-image output row reads from the pad region carries
    exactly the value clamp-to-edge would have produced.  Sobel's global
    bottom border row is re-zeroed after the crop (the in-graph zeroing hit
    the padded bottom row instead).
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    spec = _specs(mesh)
    sharding = NamedSharding(mesh, spec)

    if filter_name == "gaussian":
        body = partial(_gaussian_body, radius=radius, use_pallas=use_pallas)
        in_specs = (spec, P())
    elif filter_name == "box":
        body = partial(_box_body, radius=radius, use_pallas=use_pallas)
        in_specs = (spec,)
    elif filter_name == "sobel":
        body = partial(_sobel_body, level=level, use_pallas=use_pallas)
        in_specs = (spec,)
    else:
        raise ValueError(f"Unknown filter: {filter_name}")

    shard_fn = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=spec,
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )

    def fn(batch, *rest):
        b, h = batch.shape[0], batch.shape[1]
        pad_b = -b % dp
        h_target = spatial_h_target(h, sp, filter_name, radius)
        pad_h = h_target - h
        if pad_b or pad_h:
            batch = jnp.pad(
                batch, ((0, pad_b), (0, pad_h), (0, 0), (0, 0)), mode="edge"
            )
        batch = jax.lax.with_sharding_constraint(batch, sharding)
        out = shard_fn(batch, *rest)
        if pad_b or pad_h:
            out = out[:b, :h]
            if filter_name == "sobel" and pad_h:
                out = out.at[:, h - 1].set(jnp.uint8(0))
        return out

    return jax.jit(fn)
