"""Pallas level-2 tier registry (kernels land in gaussian.py/box.py/sobel.py)."""

from __future__ import annotations

from typing import Callable


def level2_impls() -> dict[str, Callable]:
    """Return the Pallas-backed level-2 implementations available on this
    platform.  Missing entries fall back to the XLA-fused tier."""
    impls: dict[str, Callable] = {}
    return impls
