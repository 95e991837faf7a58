"""Device selection helpers and persistent-compile-cache setup."""

from __future__ import annotations

import functools
import os

import jax


def _force_platform() -> None:
    """Honor GIP_TPU_PLATFORM=cpu|tpu|axon.

    Needed because some PJRT plugin environments pin JAX_PLATFORMS globally
    (and may ignore a user override); `jax.config` applied before backend
    initialization always works, and restricting to `cpu` also prevents the
    process from claiming a (possibly single-tenant) accelerator at all.
    """
    plat = os.environ.get("GIP_TPU_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # pragma: no cover
            pass


_force_platform()


def _setup_compilation_cache() -> None:
    """Enable the XLA persistent compilation cache (opt-out via env).

    The reference pays per-call kernel-weight uploads; our analog cost is
    XLA compilation, which this cache amortizes across processes (a cold
    compile of one filter takes minutes on a 1-core host).
    """
    if os.environ.get("GIP_TPU_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.environ.get(
        "GIP_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "gip_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without the flag
        pass


_setup_compilation_cache()


@functools.lru_cache(maxsize=1)
def default_device() -> jax.Device:
    """The device all single-image filtering runs on (device 0, the analog of
    the reference pinning CUDA device 0, ncu_profiler.py:147)."""
    return jax.devices()[0]


@functools.lru_cache(maxsize=1)
def platform() -> str:
    return default_device().platform


def is_tpu() -> bool:
    return platform() == "tpu"


@functools.lru_cache(maxsize=1)
def warmup_transfers() -> None:
    """Absorb one-time host<->device transfer-path initialization.

    On remote-attached (tunneled) TPUs the very first device->host transfer
    of a process can stall for minutes while the transfer stream is
    established; afterwards transfers run at line rate.  Doing a 1-element
    round trip up front keeps that cost out of every request path.  No-op
    cost on locally attached devices.
    """
    import jax.numpy as jnp
    import numpy as np

    x = jax.device_put(np.zeros(128, np.uint8), default_device())
    y = jnp.asarray(x) + 1
    np.asarray(y)
