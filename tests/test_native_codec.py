"""Native C++ codec tier: correctness vs PIL/stdlib, and codec fallbacks."""

import base64
import io

import numpy as np
import pytest
from PIL import Image

from gpu_image_processing_tpu.utils import native_codec
from gpu_image_processing_tpu.utils.image import decode_base64_image, encode_image_to_base64

from .conftest import make_image

needs_native = pytest.mark.skipif(
    not native_codec.available(), reason="native codec not built"
)


@needs_native
@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_roundtrip_native(rng, c):
    img = make_image(rng, 23, 37, c)
    png = native_codec.png_encode(img)
    assert png is not None and png[:4] == b"\x89PNG"
    # PIL must be able to read our PNGs...
    via_pil = np.array(Image.open(io.BytesIO(png)))
    if via_pil.ndim == 2:
        via_pil = via_pil[:, :, None]
    np.testing.assert_array_equal(via_pil, img)
    # ...and our decoder must read them back exactly.
    out = native_codec.png_decode(png)
    np.testing.assert_array_equal(out, img)


@needs_native
def test_native_decodes_pil_png(rng):
    # All five PNG filter types can appear in PIL output; decode must match.
    img = make_image(rng, 64, 81, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    out = native_codec.png_decode(buf.getvalue())
    assert out is not None
    np.testing.assert_array_equal(out, img)


@needs_native
def test_b64_roundtrip(rng):
    data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    enc = native_codec.b64_encode(data)
    assert enc == base64.b64encode(data)
    assert native_codec.b64_decode(enc) == data


@needs_native
def test_b64_decode_rejects_garbage():
    assert native_codec.b64_decode(b"!!!*&^not-base64") is None


def test_codec_pipeline_rgba_normalized(rng):
    # RGBA input -> RGB normalization through whichever tier is active.
    img = make_image(rng, 12, 15, 4)
    data_url = encode_image_to_base64(img)
    arr = decode_base64_image(data_url)
    assert arr.shape == (12, 15, 3)
    np.testing.assert_array_equal(arr, img[:, :, :3])


def _smooth_rgb(rng, h, w):
    """A JPEG-friendly image (gradients + mild noise): lossy roundtrips on
    pure random noise have unbounded per-pixel error at any quality."""
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    base = (x + y) / 2 + rng.normal(0, 4, (h, w, 3))
    return base.clip(0, 255).astype(np.uint8)


@needs_native
def test_jpeg_roundtrip_native(rng):
    img = _smooth_rgb(rng, 40, 56)
    jpg = native_codec.jpeg_encode(img, quality=92)
    assert jpg is not None and jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
    out = native_codec.jpeg_decode(jpg)
    assert out is not None and out.shape == img.shape
    # Lossy: bounded reconstruction error on smooth content.
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 24
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) <= 3.0


@needs_native
def test_jpeg_encode_rejects_over_16bit_dims():
    # SOF0 dimensions are 16-bit (T.81 B.2.2); without the cap a 70000-row
    # image silently truncated to 4464 in the header while the entropy
    # data encoded all 70000 -- a corrupt-but-"successful" stream
    # (review finding).  1xN keeps the probe tiny.
    img = np.zeros((70000, 1, 3), dtype=np.uint8)
    assert native_codec.jpeg_encode(img) is None
    img = np.zeros((1, 70000, 3), dtype=np.uint8)
    assert native_codec.jpeg_encode(img) is None


@needs_native
def test_jpeg_interop_with_pil(rng):
    """Both directions against libjpeg: PIL reads ours, we read PIL's
    (including its default 4:2:0 chroma subsampling), within the small
    IDCT-implementation variance T.81 permits."""
    img = _smooth_rgb(rng, 48, 64)
    jpg = native_codec.jpeg_encode(img, quality=92)
    pil_view = np.array(Image.open(io.BytesIO(jpg)).convert("RGB"))
    ours_view = native_codec.jpeg_decode(jpg)
    assert int(np.abs(pil_view.astype(int) - ours_view.astype(int)).max()) <= 4

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=75)  # 4:2:0
    ours = native_codec.jpeg_decode(buf.getvalue())
    pil = np.array(Image.open(buf))
    assert ours is not None and ours.shape == pil.shape
    assert int(np.abs(ours.astype(int) - pil.astype(int)).max()) <= 4


@needs_native
def test_jpeg_gray_native(rng):
    img = _smooth_rgb(rng, 24, 30)[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    ours = native_codec.jpeg_decode(buf.getvalue())
    assert ours is not None and ours.shape == (24, 30, 1)
    pil = np.array(Image.open(buf))
    assert int(np.abs(ours[:, :, 0].astype(int) - pil.astype(int)).max()) <= 2


@needs_native
def test_jpeg_serving_path_native(rng):
    # decode_base64_image decodes baseline JPEG (the most common upload
    # format) and normalizes to RGB.  JPEG routes to PIL first (libjpeg-turbo
    # measured ~8x faster than the native scalar decoder); the native tier
    # covers the no-PIL deployment — exercised here by masking PIL.
    img = _smooth_rgb(rng, 16, 16)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    data_url = "data:image/jpeg;base64," + base64.b64encode(buf.getvalue()).decode()
    arr = decode_base64_image(data_url)
    assert arr.shape == (16, 16, 3)
    assert int(np.abs(arr.astype(int) - img.astype(int)).max()) <= 20

    # Same payload through the native tier (PIL masked out).
    from gpu_image_processing_tpu.utils import image as image_mod

    orig = image_mod.PIL_AVAILABLE
    image_mod.PIL_AVAILABLE = False
    try:
        arr_native = decode_base64_image(data_url)
    finally:
        image_mod.PIL_AVAILABLE = orig
    assert arr_native.shape == (16, 16, 3)
    assert int(np.abs(arr_native.astype(int) - img.astype(int)).max()) <= 20


def test_png_chunk_neutrality_scanner(rng):
    # The original-image passthrough gate: rendering-neutral chunks pass,
    # anything affecting display (tRNS, gAMA, APNG, ...) or a malformed
    # chunk stream refuses the passthrough.
    from gpu_image_processing_tpu.utils.image import _png_chunks_neutral
    import struct, zlib as _zlib

    img = make_image(rng, 8, 9, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    plain = buf.getvalue()
    assert _png_chunks_neutral(plain)

    def insert_chunk(png: bytes, ctype: bytes, data: bytes) -> bytes:
        # splice a chunk right after IHDR (signature 8 + IHDR 12+13 bytes)
        cut = 8 + 12 + 13
        chunk = struct.pack(">I", len(data)) + ctype + data
        chunk += struct.pack(">I", _zlib.crc32(ctype + data) & 0xFFFFFFFF)
        return png[:cut] + chunk + png[cut:]

    assert not _png_chunks_neutral(insert_chunk(plain, b"gAMA", b"\x00\x00\xb1\x8f"))
    assert not _png_chunks_neutral(insert_chunk(plain, b"tRNS", b"\x00\xff\x00\x00\x00\x00"))
    assert not _png_chunks_neutral(insert_chunk(plain, b"acTL", b"\x00\x00\x00\x01\x00\x00\x00\x00"))
    # neutral metadata chunks keep the passthrough
    assert _png_chunks_neutral(insert_chunk(plain, b"tEXt", b"Comment\x00hi"))
    # truncated stream (no IEND reached) refuses
    assert not _png_chunks_neutral(plain[:-20])
    # declared chunk length running past the buffer refuses (no IEND seen)
    bogus = insert_chunk(plain, b"tEXt", b"x" * 4)
    bogus = bogus[:8 + 12 + 13] + struct.pack(">I", 1 << 30) + bogus[8 + 12 + 17:]
    assert not _png_chunks_neutral(bogus)


def test_codec_pipeline_jpeg_progressive(rng):
    # Progressive JPEG decodes on whichever tier is active (native since
    # round 4; PIL first in this image) — transparently either way.
    img = make_image(rng, 16, 16, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", progressive=True)
    data_url = "data:image/jpeg;base64," + base64.b64encode(buf.getvalue()).decode()
    arr = decode_base64_image(data_url)
    assert arr.shape == (16, 16, 3)


@needs_native
def test_jpeg_progressive_native_interop(rng):
    """Progressive (SOF2) streams decode natively within the same
    IDCT-variance band as baseline (T.81 Annex G: spectral selection +
    successive approximation; libjpeg's standard scan script exercises
    DC first/refine and AC first/refine).  stb decodes the same process
    (stb_image.h:23, 1975-3082)."""
    img = _smooth_rgb(rng, 49, 67)
    for subsampling in (0, 1, 2):
        buf = io.BytesIO()
        Image.fromarray(img).save(
            buf, format="JPEG", quality=88, progressive=True,
            subsampling=subsampling)
        ours = native_codec.jpeg_decode(buf.getvalue())
        pil = np.array(Image.open(buf).convert("RGB"))
        assert ours is not None and ours.shape == pil.shape
        assert int(np.abs(ours.astype(int) - pil.astype(int)).max()) <= 4

    # Grayscale progressive (single-component scans are non-interleaved).
    gray = img[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(gray).save(buf, format="JPEG", quality=90, progressive=True)
    ours = native_codec.jpeg_decode(buf.getvalue())
    pil = np.array(Image.open(buf))
    assert ours is not None and ours.shape == (49, 67, 1)
    assert int(np.abs(ours[:, :, 0].astype(int) - pil.astype(int)).max()) <= 2


@needs_native
def test_jpeg_progressive_restart_markers(rng):
    """DRI/RSTn inside progressive scans: restart resets DC predictors AND
    the EOB run (T.81 Annex G)."""
    img = _smooth_rgb(rng, 41, 53)
    for kw in ({"restart_marker_blocks": 4}, {"restart_marker_rows": 2},
               {"restart_marker_blocks": 1}):
        buf = io.BytesIO()
        Image.fromarray(img).save(
            buf, format="JPEG", quality=85, progressive=True, **kw)
        data = buf.getvalue()
        assert b"\xff\xdd" in data[:600]  # DRI actually present
        ours = native_codec.jpeg_decode(data)
        pil = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
        assert ours is not None
        assert int(np.abs(ours.astype(int) - pil.astype(int)).max()) <= 4


@needs_native
def test_jpeg_progressive_serving_tier(rng):
    # With PIL masked, a progressive upload decodes on the native tier
    # (decode_tiers.native_jpeg increments) — the VERDICT r3 "done" gate.
    from gpu_image_processing_tpu.utils import image as image_mod

    img = _smooth_rgb(rng, 24, 24)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90, progressive=True)
    data_url = "data:image/jpeg;base64," + base64.b64encode(buf.getvalue()).decode()

    image_mod.reset_decode_tier_counts()
    orig = image_mod.PIL_AVAILABLE
    image_mod.PIL_AVAILABLE = False
    try:
        arr = decode_base64_image(data_url)
    finally:
        image_mod.PIL_AVAILABLE = orig
    assert arr.shape == (24, 24, 3)
    assert image_mod.decode_tier_counts()["native_jpeg"] == 1
    assert int(np.abs(arr.astype(int) - img.astype(int)).max()) <= 24


@needs_native
def test_jpeg_progressive_truncated_rejected(rng):
    # A progressive stream cut mid-scan (or before any scan) must error,
    # not return a half-filled image silently.
    img = _smooth_rgb(rng, 32, 32)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=85, progressive=True)
    data = buf.getvalue()
    sos = data.find(b"\xff\xda")
    assert sos > 0
    assert native_codec.jpeg_decode(data[:sos]) is None  # no scan at all
    for cut in (sos + 4, len(data) // 2, len(data) - 3):
        native_codec.jpeg_decode(data[:cut])  # must not crash


def test_palette_png_decodes_natively(rng):
    # Palette-mode PNGs are inside the native decoder's subset since round
    # 4 (PLTE expansion, stb_image.h:5134 analog): the serving path decodes
    # them on the native tier and the result matches PIL's own palette
    # expansion byte-for-byte.
    from gpu_image_processing_tpu.utils import image as image_util

    image_util.reset_decode_tier_counts()
    img = make_image(rng, 10, 11, 3)
    pal = Image.fromarray(img).convert("P", palette=Image.ADAPTIVE)
    buf = io.BytesIO()
    pal.save(buf, format="PNG")
    data_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    arr = decode_base64_image(data_url)
    assert arr.shape == (10, 11, 3)
    if native_codec.available():
        assert image_util.decode_tier_counts()["native_png"] == 1
        assert image_util.decode_tier_counts()["pil"] == 0
    np.testing.assert_array_equal(
        arr, np.array(pal.convert("RGB")))


def test_gif_still_decodes_via_pil(rng):
    """GIF coverage (stb decodes GIF natively, stb_image.h:118-139): here
    a GIF still rides the PIL tier by design -- PIL's LZW decode is
    C-speed and also covers animated-first-frame and WebP, which stb
    cannot; the tier counters make the fallback visible.  Recorded in
    PARITY.md (decoder-breadth note)."""
    from gpu_image_processing_tpu.utils import image as image_util

    image_util.reset_decode_tier_counts()
    img = make_image(rng, 12, 13, 3)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="GIF")
    data_url = ("data:image/gif;base64,"
                + base64.b64encode(buf.getvalue()).decode())
    arr = decode_base64_image(data_url)
    assert arr.shape == (12, 13, 3)
    # GIF is palette-quantized (<=256 colors), not lossless for photos.
    assert image_util.decode_tier_counts()["pil"] == 1


def test_16bit_png_falls_back(rng):
    arr16 = rng.integers(0, 65535, (8, 9), dtype=np.uint16)
    im = Image.fromarray(arr16)  # uint16 -> mode I;16
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    data_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    out = decode_base64_image(data_url)
    assert out.ndim == 3 and out.shape[2] == 3


def test_gray_alpha_png_normalized(rng):
    la = np.dstack([make_image(rng, 7, 8, 1)[:, :, 0],
                    np.full((7, 8), 200, np.uint8)])
    im = Image.fromarray(la, mode="LA")
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    data_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    out = decode_base64_image(data_url)
    assert out.shape == (7, 8, 3)


@needs_native
def test_jpeg_fuzz_interop(rng):
    """Randomized sizes/qualities vs libjpeg, both directions."""
    for _ in range(6):
        h = int(rng.integers(8, 120))
        w = int(rng.integers(8, 120))
        q = int(rng.integers(55, 98))
        img = _smooth_rgb(rng, h, w)
        # ours -> PIL
        jpg = native_codec.jpeg_encode(img, quality=q)
        assert jpg is not None
        pil = np.array(Image.open(io.BytesIO(jpg)).convert("RGB"))
        ours = native_codec.jpeg_decode(jpg)
        assert pil.shape == ours.shape == img.shape
        assert int(np.abs(pil.astype(int) - ours.astype(int)).max()) <= 4
        # PIL (4:2:0 default) -> ours
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=q)
        ours2 = native_codec.jpeg_decode(buf.getvalue())
        pil2 = np.array(Image.open(buf))
        assert ours2 is not None
        d = np.abs(ours2.astype(int) - pil2.astype(int))
        # The decoder uses libjpeg-style triangular ("fancy") chroma
        # upsampling for ratio-2 axes; residual differences are IDCT
        # implementation variance T.81 permits.
        assert int(d.max()) <= 4 and float(d.mean()) <= 0.5


@needs_native
def test_jpeg_malformed_inputs_rejected(rng):
    """Stream-supplied table indices and truncations must return None
    (decode error), never crash the process (a crafted upload previously
    segfaulted the server through decode_base64_image)."""
    # tq = 200 in SOF
    bad_tq = bytes([0xFF, 0xD8, 0xFF, 0xC0, 0, 11, 8, 0, 16, 0, 16, 1,
                    1, 0x11, 200, 0xFF, 0xD9])
    assert native_codec.jpeg_decode(bad_tq) is None
    # SOS references undefined Huffman table 15
    bad_tbl = bytes([0xFF, 0xD8, 0xFF, 0xC0, 0, 11, 8, 0, 16, 0, 16, 1,
                     1, 0x11, 0,
                     0xFF, 0xDA, 0, 8, 1, 1, 0xFF, 0, 63, 0,
                     0x00, 0xFF, 0xD9])
    assert native_codec.jpeg_decode(bad_tbl) is None
    # random truncations of a valid stream
    img = _smooth_rgb(rng, 24, 32)
    jpg = native_codec.jpeg_encode(img, 85)
    for cut in (10, len(jpg) // 3, len(jpg) - 3):
        native_codec.jpeg_decode(jpg[:cut])  # must not crash (None or junk)
    # random byte corruption (headers region)
    for _ in range(8):
        b = bytearray(jpg)
        i = int(rng.integers(2, min(len(b), 200)))
        b[i] = int(rng.integers(0, 256))
        native_codec.jpeg_decode(bytes(b))  # must not crash


@needs_native
def test_jpeg_annex_k_table_order():
    """The DQT segment must carry the Annex-K table in zigzag order (entry
    i = natural position kZigzag[i]); a raster-ordered emission quantizes
    the wrong frequencies (caught in review)."""
    img = np.zeros((16, 16, 3), np.uint8)
    jpg = native_codec.jpeg_encode(img, 50)  # scale 100 -> table as-is
    # parse first DQT segment
    i = jpg.index(b"\xff\xdb")
    table = list(jpg[i + 5 : i + 5 + 64])  # skip len(2)+pq_tq(1)
    zigzag = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
              12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
              35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
              58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    annex_k = [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
               14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
               18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
               49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
    natural = [0] * 64
    for idx, z in enumerate(zigzag):
        natural[z] = table[idx]
    assert natural == annex_k


@needs_native
def test_jpeg_single_component_sampling_factors(rng):
    """T.81: a single-component scan is non-interleaved (one data unit per
    MCU) regardless of declared sampling factors.  Some encoders emit gray
    JPEGs with hs=vs=2; decoding them with interleaved-MCU geometry
    garbles the image (caught in review).  Craft one by patching the SOF
    sampling byte of our own gray output -- the entropy data layout is
    identical either way."""
    img = (np.linspace(0, 255, 24 * 32).reshape(24, 32)).astype(np.uint8)
    jpg = bytearray(native_codec.jpeg_encode(img, 90))
    i = jpg.index(b"\xff\xc0")
    hv_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert jpg[hv_off] == 0x11
    jpg[hv_off] = 0x22
    out = native_codec.jpeg_decode(bytes(jpg))
    ref = native_codec.jpeg_decode(bytes(native_codec.jpeg_encode(img, 90)))
    assert out is not None and out.shape == (24, 32, 1)
    np.testing.assert_array_equal(out, ref)


@needs_native
def test_png_header_bomb_rejected():
    """A ~60-byte PNG declaring 2^30 x 2^30 pixels must be rejected by the
    dimension cap, not drive a multi-GB allocation whose bad_alloc would
    unwind through the C ABI and abort the serving process."""
    import struct
    import zlib as _zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(b"\x00" * 16))
        + chunk(b"IEND", b"")
    )
    assert native_codec.png_decode(bomb) is None
    # Same guard for a zero-dimension header.
    ihdr0 = struct.pack(">IIBBBBB", 0, 5, 8, 2, 0, 0, 0)
    bomb0 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr0)
        + chunk(b"IDAT", _zlib.compress(b"\x00" * 16)) + chunk(b"IEND", b"")
    )
    assert native_codec.png_decode(bomb0) is None


@needs_native
def test_jpeg_header_bomb_rejected():
    """A tiny JPEG whose SOF declares 65535 x 65535 x 3 (~13 GB of planes)
    must be rejected by the pixel cap before any plane allocation."""
    sof = bytes(
        [0xFF, 0xD8, 0xFF, 0xC0, 0, 17, 8, 0xFF, 0xFF, 0xFF, 0xFF, 3,
         1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1, 0xFF, 0xD9]
    )
    assert native_codec.jpeg_decode(sof) is None


@needs_native
def test_jpeg_double_sof_rejected():
    """Two SOF markers desync declared geometry from allocated planes
    (stale hmax/vmax sized the planes while the second frame's dims drove
    the output copy -- a heap-OOB read found by review, ASan-confirmed).
    A second SOF must reject the stream."""
    def seg(marker, payload):
        ln = len(payload) + 2
        return bytes([0xFF, marker, ln >> 8, ln & 0xFF]) + bytes(payload)

    dqt = seg(0xDB, [0x00] + [1] * 64)
    sof1 = seg(0xC0, [8, 0, 8, 0, 8, 3,
                      1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    sof2 = seg(0xC0, [8, 0, 32, 0, 32, 1, 1, 0x11, 0])
    dht = seg(0xC4, [0x00, 1] + [0] * 15 + [0])       # 1 code of len 1 -> sym 0
    dht += seg(0xC4, [0x10, 1] + [0] * 15 + [0])
    sos = seg(0xDA, [1, 1, 0x00, 0, 63, 0])
    stream = b"\xff\xd8" + dqt + sof1 + sof2 + dht + sos + b"\x00" + b"\xff\xd9"
    assert native_codec.jpeg_decode(stream) is None


@needs_native
def test_jpeg_missing_scan_rejected():
    """SOF but no SOS (truncated upload): previously returned rc=0 with an
    all-black image (the zero-filled planes); must be a decode error."""
    def seg(marker, payload):
        ln = len(payload) + 2
        return bytes([0xFF, marker, ln >> 8, ln & 0xFF]) + bytes(payload)

    dqt = seg(0xDB, [0x00] + [1] * 64)
    sof = seg(0xC0, [8, 0, 16, 0, 16, 1, 1, 0x11, 0])
    stream = b"\xff\xd8" + dqt + sof + b"\xff\xd9"
    assert native_codec.jpeg_decode(stream) is None


@needs_native
@pytest.mark.parametrize("c", [1, 3, 4])
def test_tga_native_roundtrip(rng, c, tmp_path):
    """gip_tga_write/read roundtrip through the CLI's load/save helpers."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "filter_image", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "filter_image.py"))
    fi = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fi)

    img = make_image(rng, 21, 17, c)
    path = str(tmp_path / "native.tga")
    fi.save_image(path, img)
    with open(path, "rb") as f:
        hdr = f.read(18)
    assert hdr[2] == (3 if c == 1 else 2)  # uncompressed types
    # Top-down origin bit: gip_tga_write always sets it, PIL's fallback
    # writes bottom-up -- this catches save_image routing to PIL.
    assert hdr[17] & 0x20
    back = fi.load_image(path)
    # load_image strips alpha like the reference CLI (test_real_image.cu:122).
    want = img[:, :, :3] if c == 4 else img
    np.testing.assert_array_equal(back, want)
    # PIL must agree on the file's pixels (interop with the wider world).
    pil = np.array(Image.open(path))
    if pil.ndim == 2:
        pil = pil[:, :, None]
    np.testing.assert_array_equal(pil[:, :, : img.shape[2]], img)


@needs_native
def test_tga_reads_pil_rle(rng, tmp_path):
    """PIL's RLE-compressed bottom-up TGA decodes through gip_tga_read."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "filter_image", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "filter_image.py"))
    fi = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fi)

    img = make_image(rng, 15, 23, 3)
    img[4:9, :] = 77  # constant band so RLE produces run packets
    path = str(tmp_path / "pil_rle.tga")
    Image.fromarray(img).save(path, rle=True)
    with open(path, "rb") as f:
        assert f.read(3)[2] == 10  # RLE truecolor
    np.testing.assert_array_equal(fi.load_image(path), img)


def test_jpeg_header_neutrality_scanner(rng):
    from gpu_image_processing_tpu.utils.image import _jpeg_headers_neutral

    img = _smooth_rgb(rng, 16, 16)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    plain = buf.getvalue()
    assert _jpeg_headers_neutral(plain)

    # EXIF (APP1) must disqualify: orientation could rotate the display.
    buf = io.BytesIO()
    exif = Image.Exif()
    exif[274] = 6  # Orientation: rotate 90
    Image.fromarray(img).save(buf, format="JPEG", quality=90, exif=exif)
    with_exif = buf.getvalue()
    assert b"Exif" in with_exif
    assert not _jpeg_headers_neutral(with_exif)

    # Progressive (SOF2) must disqualify: multiple scans can carry markers.
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90, progressive=True)
    assert not _jpeg_headers_neutral(buf.getvalue())

    # ICC profile (APP2) must disqualify.
    app2 = b"\xff\xe2" + (14).to_bytes(2, "big") + b"ICC_PROFILE\x00"
    spliced = plain[:2] + app2 + plain[2:]
    assert not _jpeg_headers_neutral(spliced)

    # Degenerates: truncation before SOS, bad magic, zero-length segment.
    sos = plain.find(b"\xff\xda")
    assert not _jpeg_headers_neutral(plain[:sos])
    assert not _jpeg_headers_neutral(b"\x89PNG")
    assert not _jpeg_headers_neutral(plain[:2] + b"\xff\xdb\x00\x01" + plain[2:])

    # The entropy TAIL is verified, not assumed: baseline files may legally
    # hold several scans with APPn/COM between them, so a marker after the
    # first SOS other than RST/EOI (late EXIF, a second scan's SOS/DHT)
    # disqualifies, as do bytes after EOI and a missing EOI.
    assert plain.endswith(b"\xff\xd9")
    body = plain[:-2]
    late_exif = body + b"\xff\xe1" + (8).to_bytes(2, "big") + b"Exif\x00\x00" \
        + b"\xff\xd9"
    assert not _jpeg_headers_neutral(late_exif)
    assert not _jpeg_headers_neutral(plain + b"junk")   # trailing garbage
    assert not _jpeg_headers_neutral(body)              # EOI missing
