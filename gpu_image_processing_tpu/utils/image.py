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


from . import native_codec


class ImageCodecError(ValueError):
    pass


def decode_base64_image(base64_str: str) -> np.ndarray:
    """Decode a (possibly data-URL-prefixed) base64 string to (H, W, 3) u8.

    Fast path: the native C++ codec (base64 + PNG inflate/unfilter); falls
    back to PIL for formats the native tier doesn't cover (JPEG, palette or
    16-bit PNG, interlaced, ...).
    """
    try:
        if "," in base64_str:
            base64_str = base64_str.split(",", 1)[1]
        raw = native_codec.b64_decode(base64_str.encode("ascii", "ignore"))
        if raw is None:
            raw = base64.b64decode(base64_str)
    except (binascii.Error, ValueError, UnicodeEncodeError) as exc:
        raise ImageCodecError(f"Failed to decode image: {exc}") from None
    if not raw:
        raise ImageCodecError("Failed to decode image: empty payload")

    arr = native_codec.png_decode(raw)
    if arr is None and len(raw) > 3 and raw[:2] == b"\xff\xd8":
        # Baseline JPEG decodes in the native tier too (the browser's most
        # common upload format); progressive/CMYK fall through to PIL.
        arr = native_codec.jpeg_decode(raw)
    if arr is not None:
        # Normalize to RGB like the reference server (app.py:80-83).
        if arr.shape[2] == 1:
            arr = np.repeat(arr, 3, axis=2)
        elif arr.shape[2] == 2:     # gray+alpha
            arr = np.repeat(arr[:, :, :1], 3, axis=2)
        elif arr.shape[2] == 4:
            arr = arr[:, :, :3].copy()
        return arr

    try:
        image = Image.open(io.BytesIO(raw))
        if image.mode != "RGB":
            # RGBA/L normalization as in the reference (app.py:80-83),
            # extended to every other mode (palette, 16-bit, float) so the
            # pipeline always sees uint8 RGB.
            if image.mode in ("I", "I;16", "I;16B", "I;16L", "F"):
                arr16 = np.asarray(image, dtype=np.float32)
                scale = 255.0 / max(float(arr16.max()), 1.0)
                image = Image.fromarray((arr16 * scale).astype(np.uint8))
            image = image.convert("RGB")
        arr = np.array(image)
    except Exception as exc:
        raise ImageCodecError(f"Failed to decode image: {exc}") from None
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.dtype != np.uint8:
        raise ImageCodecError(f"Failed to decode image: unsupported pixel type {arr.dtype}")
    return arr


def encode_image_to_base64(img_array: np.ndarray) -> str:
    """Encode an HWC uint8 array to a PNG data URL (native tier preferred)."""
    if img_array.dtype != np.uint8:
        img_array = img_array.astype(np.uint8)

    png = native_codec.png_encode(img_array)
    if png is not None:
        b64 = native_codec.b64_encode(png)
        payload = (b64 if b64 is not None else base64.b64encode(png)).decode("ascii")
        return f"data:image/png;base64,{payload}"

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
