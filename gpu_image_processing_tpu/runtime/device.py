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


# Set by demote_to_cpu() when the accelerator is declared dead for this
# process; consulted by default_device() ahead of the cached pick.
_DEVICE_OVERRIDE: jax.Device | None = None
_DEMOTION_REASON: str | None = None


@functools.lru_cache(maxsize=1)
def _default_device_cached() -> jax.Device:
    return jax.devices()[0]


def default_device() -> jax.Device:
    """The device all single-image filtering runs on (device 0, the analog of
    the reference pinning CUDA device 0, ncu_profiler.py:147) — unless the
    runtime demoted the process to CPU after repeated device failures."""
    if _DEVICE_OVERRIDE is not None:
        return _DEVICE_OVERRIDE
    return _default_device_cached()


def platform() -> str:
    return default_device().platform


def is_tpu() -> bool:
    return platform() == "tpu"


def is_axon_relay() -> bool:
    """Whether compute actually runs on the TPU behind the axon tunnel
    plugin.

    Two conditions, both required: (a) the env names the axon plugin (its
    only loading path -- the device itself reports plain "tpu"), and (b)
    the live backend platform IS the tpu one (the test suite keeps
    JAX_PLATFORMS=axon inherited from the host but forces CPU via
    JAX_PLATFORM_NAME/GIP_TPU_PLATFORM, and a demoted process runs on CPU
    -- neither leaks).  Used to default-enable the serving RSS watchdog:
    the relay client permanently leaks ~1.3 MB of host staging per
    device_put (measured 2026-08-18), so long-lived serving processes
    must recycle."""
    env = " ".join((os.environ.get("GIP_TPU_PLATFORM", ""),
                    os.environ.get("JAX_PLATFORMS", ""),
                    os.environ.get("JAX_PLATFORM_NAME", "")))
    if "axon" not in env.lower():
        return False
    try:
        return platform() == "tpu"
    except Exception:
        return False


def demote_to_cpu(reason: str = "") -> bool:
    """Permanently (for this process) route filtering to the CPU backend.

    Elastic-recovery escape hatch for a mid-session accelerator loss: on
    this host the axon relay lease can die while the server is up (observed
    2026-08-17: every later device call fails UNAVAILABLE until the lease
    clears, tens of minutes).  A CPU-served filter beats a 500.  Returns
    True if a demotion happened; False when already on CPU, or when no
    cpu backend is registered (jax_platforms pinned to a non-cpu value --
    logged loudly below, since demotion is then impossible).

    The caller owns invalidating anything compiled for the old device
    (FilterRuntime clears its executable cache).
    """
    global _DEVICE_OVERRIDE, _DEMOTION_REASON
    try:
        if default_device().platform == "cpu":
            return False
    except Exception:
        # Backend init itself is failing -- exactly the situation demotion
        # exists for; fall through and try the cpu backend.
        pass
    try:
        cpu = jax.devices("cpu")[0]
    except Exception as exc:
        # Happens when jax_platforms is PINNED to a non-cpu value (the
        # _force_platform path above, or a plugin pinning JAX_PLATFORMS):
        # the cpu backend is then not registered and demotion cannot work.
        # Refuse loudly so the operator knows why the server keeps 500ing.
        import logging

        logging.getLogger(__name__).error(
            "Cannot demote to CPU: no cpu backend available (%s). Is "
            "jax_platforms pinned? Restart with GIP_TPU_PLATFORM=cpu to "
            "serve without the accelerator.", exc)
        return False
    _DEVICE_OVERRIDE = cpu
    _DEMOTION_REASON = reason or "accelerator failure"
    return True


def demotion_reason() -> str | None:
    """Why this process left the accelerator (None = never demoted)."""
    return _DEMOTION_REASON


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
