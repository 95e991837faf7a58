"""Request/response schemas for the REST API.

Field-for-field match of the reference's pydantic models
(backend/app.py:46-63) so existing reference clients work unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pydantic import BaseModel

from ..core import config


class FilterRequest(BaseModel):
    image: str                      # base64 encoded (data-URL prefix ok)
    filter: str                     # "gaussian" | "box" | "sobel"
    level: int = 1                  # 1=naive, 2=optimized
    sigma: Optional[float] = config.DEFAULT_SIGMA
    radius: Optional[int] = config.DEFAULT_RADIUS
    enable_profiling: bool = False  # deep XLA profiling (ncu analog)


class FilterResponse(BaseModel):
    processed_image: str
    metrics: Dict[str, Any]
    info: Dict[str, Any]


class AllLevelsResponse(BaseModel):
    original_image: str
    results: Dict[str, FilterResponse]   # "level_1", "level_2", ...
    image_info: Dict[str, Any]
    profiling_available: bool = False
