"""Test configuration: run on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere, so this lives at the
top of conftest collection.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME and the
# config flag below do take effect.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
# Off-TPU, utilization percentages are omitted in production (no trusted
# peak table); tests opt in to placeholder peaks so the UI percentage path
# keeps coverage on the CPU mesh.  test_models_profiling clears this to
# assert the production omission.
os.environ.setdefault("GIP_TPU_TEST_PEAKS", "1")
# Test images are small; without this pin the size-based tier routing would
# serve every level-2 case from the XLA tier and the Pallas kernels would
# lose their interpreter coverage.  Routing itself is tested explicitly in
# test_bucketing.py::test_tier_routing_*.
os.environ.setdefault("GIP_TPU_XLA_TIER_MAX_PIXELS", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: this host has a single CPU core, so cold
# XLA compiles dominate test time; warm runs hit the cache.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_image(rng, h, w, c):
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.fixture
def small_rgb(rng):
    return make_image(rng, 24, 31, 3)


@pytest.fixture
def small_gray(rng):
    return make_image(rng, 19, 23, 1)


@pytest.fixture
def small_rgba(rng):
    return make_image(rng, 17, 29, 4)
