"""Image codec helpers: base64 <-> numpy HWC uint8.

Same contract as the reference's helpers (backend/app.py:66-111): inbound
images are normalized so the serving path always processes RGB (RGBA and
grayscale are converted, app.py:80-83); outbound images are PNG-encoded and
returned as a ``data:image/png;base64,`` URL.
"""

from __future__ import annotations

import base64
import binascii
import io

import numpy as np

try:
    from PIL import Image

    PIL_AVAILABLE = True
except ImportError:  # pragma: no cover
    PIL_AVAILABLE = False


class ImageCodecError(ValueError):
    pass


def decode_base64_image(base64_str: str) -> np.ndarray:
    """Decode a (possibly data-URL-prefixed) base64 string to (H, W, 3) u8."""
    try:
        if "," in base64_str:
            base64_str = base64_str.split(",", 1)[1]
        raw = base64.b64decode(base64_str)
    except (binascii.Error, ValueError) as exc:
        raise ImageCodecError(f"Failed to decode image: {exc}") from None
    try:
        image = Image.open(io.BytesIO(raw))
        if image.mode in ("RGBA", "L", "P", "LA"):
            image = image.convert("RGB")
        arr = np.array(image)
    except Exception as exc:
        raise ImageCodecError(f"Failed to decode image: {exc}") from None
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    return arr


def encode_image_to_base64(img_array: np.ndarray) -> str:
    """Encode an HWC uint8 array to a PNG data URL."""
    if img_array.dtype != np.uint8:
        img_array = img_array.astype(np.uint8)
    if img_array.ndim == 3 and img_array.shape[2] == 1:
        img_array = img_array[:, :, 0]
    image = Image.fromarray(img_array)
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    payload = base64.b64encode(buf.getvalue()).decode("utf-8")
    return f"data:image/png;base64,{payload}"


def load_image_file(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode uploaded file bytes -> (array, width, height) (app.py:496-521)."""
    image = Image.open(io.BytesIO(data))
    if image.mode not in ("RGB", "L"):
        image = image.convert("RGB")
    arr = np.array(image)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr, image.width, image.height
