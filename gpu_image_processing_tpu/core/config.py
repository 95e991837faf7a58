"""Central configuration for the TPU image-processing framework.

The CUDA reference scatters parameter defaults/ranges across five places that
must stay in sync (bindings defaults `backend/cuda_bindings/bindings.cpp:245-247`,
pydantic defaults `backend/app.py:49-52`, the `/api/filters` catalog
`backend/app.py:147-172`, HTML slider bounds `frontend/index.html:88,97`, and
C++ validation `tests/test_real_image.cu:77-85`).  Here there is exactly one
source of truth; every other layer imports from this module.
"""

from __future__ import annotations

import dataclasses
import os


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, "") or default)
    except ValueError:
        return default

# ---------------------------------------------------------------------------
# Parameter defaults and ranges (reference: backend/app.py:147-172)
# ---------------------------------------------------------------------------

DEFAULT_SIGMA: float = 2.0
DEFAULT_RADIUS: int = 3
DEFAULT_LEVEL: int = 1

SIGMA_RANGE: tuple[float, float] = (0.5, 20.0)
RADIUS_RANGE: tuple[int, int] = (1, 15)

# The CUDA reference caps the Gaussian weight table at 64 constant-memory
# floats, i.e. radius <= 31 (cuda_lib/src/image_filters.cu:13,729-732).  We
# keep the same hard cap so oversize requests fail the same way.
MAX_KERNEL_TAPS: int = 64

VALID_CHANNELS: tuple[int, ...] = (1, 3, 4)
#: Levels the comparison endpoints iterate over (backend/app.py:332).
VALID_LEVELS: tuple[int, ...] = (1, 2)
#: Levels a single /api/process request may ask for (4 = ADVANCED tier,
#: declared-but-unimplemented in the reference, image_filters.h:28).
REQUEST_LEVELS: tuple[int, ...] = (1, 2, 4)

# ---------------------------------------------------------------------------
# Serving (reference: start_servers.sh:16-17, frontend/js/app.js:2)
# ---------------------------------------------------------------------------

BACKEND_HOST: str = os.environ.get("GIP_TPU_BACKEND_HOST", "0.0.0.0")
BACKEND_PORT: int = _env_int("GIP_TPU_BACKEND_PORT", 8000)
FRONTEND_PORT: int = _env_int("GIP_TPU_FRONTEND_PORT", 8080)

#: Exit code the backend uses to request a worker recycle (RSS high-water
#: reached -- see server/app.py watchdog).  scripts/serve.py's supervisor
#: restarts the backend on exactly this code; anything else is a real exit.
EXIT_RECYCLE: int = 43

#: Default RSS high-water (MB) that triggers a graceful worker recycle when
#: the device sits behind the axon relay, whose PJRT client leaks ~1.3 MB of
#: host staging per device_put permanently (measured 2026-08-18: a 1600-
#: request soak grew the server 0.25 -> 3.5 GB with no idle recovery).
#: Override with GIP_TPU_MAX_RSS_MB; 0 disables.  On non-relay platforms the
#: watchdog is off unless the env var opts in.
AXON_DEFAULT_MAX_RSS_MB: int = 3072

# ---------------------------------------------------------------------------
# TPU execution knobs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TpuConfig:
    """Tunables for the Pallas/XLA execution path."""

    # Rows of output produced per Pallas grid step for the fused separable
    # blur kernels.  (The VMEM analog of the reference's 16x16 thread blocks,
    # image_filters.cu:773 -- but sized for VMEM instead of 48 KB of shared
    # memory.)  128 rows x ~3.3k f32 lanes needs the RAISED 64 MB scoped
    # VMEM (blur.py::_VMEM_SCOPE_BYTES; the 16 MB default capped tiles at
    # 56 rows) and measured 0.845x vs 56; 192+ rows measured WORSE -- the
    # real accounting lives in blur.py::_working_set_bytes/_pick_tile_rows,
    # which walks DOWN from these requests when a shape doesn't fit.
    blur_tile_rows: int = 128
    # Sobel keeps C uint8 planes + several f32 gradient tiles live at once;
    # 96 rows measured best at ~3.3k-lane widths under the 64 MB scope.
    sobel_tile_rows: int = 96
    # Lane alignment for the last (width) dimension.
    lane: int = 8 * 128
    sublane: int = 8
    # Number of timed repetitions used when measuring `time_ms` for the
    # metrics triplet (minimum is reported).  >1 makes the measurement
    # robust to tunnel/RPC artifacts on remote-attached devices.
    timing_reps: int = 2
    # Images at or below this pixel count serve levels 2/4 from the
    # interleaved XLA tier instead of the Pallas kernels -- measured
    # crossover on v5e (2026-08-16): XLA wins ~2x at <= 2.1 MP, Pallas wins
    # ~1.6x at 7 MP; 2-4 MP is within chip-drift noise.  Both tiers are
    # bit-exact, so routing is invisible except in speed.  Override with
    # GIP_TPU_XLA_TIER_MAX_PIXELS (0 forces Pallas everywhere).
    xla_tier_max_pixels: int = 2_500_000
    # Sobel's crossover sits LOWER: with the round-2 kernels (constant
    # pad, 96-row tiles) the Pallas rows sobel wins from ~1.4 MP (measured
    # 2026-08-17, scripts/exp_tuning.py: 2.2 MP pallas 0.18 vs xla 0.31;
    # 1.3 MP a tie; 0.6 MP xla 2.4x faster).  Gaussian/box stay at the
    # shared threshold (their tiers tie within drift noise at 2-4 MP).
    sobel_xla_tier_max_pixels: int = 1_400_000
    # Box's Pallas kernel (doubling-window sums, 128-row tiles) beats the
    # XLA tier at EVERY measured size (2026-08-17,
    # scripts/exp_box_crossover.py: 1.3 MP 0.05 vs 0.09; 4.2 MP 0.35 vs
    # 1.43 ms -- the XLA doubling tier scales badly).  Threshold kept at
    # 1 MP only because smaller sizes measure below relay noise.
    box_xla_tier_max_pixels: int = 1_000_000
    # The MXU box tier (round 4) moved box's small-image crossover DOWN
    # at MXU-eligible radii (>= BOX_MXU_MIN_RADIUS).  Guarded re-measure
    # (scripts/exp_box_small_xover.py, 2026-08-20, floor-rejected slope
    # samples): at 0.26 MP the XLA tier still wins (mxu/xla 1.6-1.8x),
    # at 0.84 MP the MXU wins decisively (r=2 0.51x, r=5 0.30x).  500k px
    # splits that bracket; r=1 (never MXU: VPU loses 1.3x at 0.84 MP)
    # keeps the plain 1 MP gate above.
    box_mxu_xla_tier_max_pixels: int = 500_000


TPU = TpuConfig()
