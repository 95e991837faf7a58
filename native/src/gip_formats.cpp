// gip_formats: native decoders for the remaining stb_image format set.
//
// The reference's C++ test tier decodes "any format" through vendored stb
// (/root/reference/external/stb_image.h:118-139 lists JPEG/PNG/TGA/BMP/PSD/
// GIF/HDR/PIC/PNM; used by tests/test_real_image.cu:7-11).  gip_codec.cpp
// covers PNG (and the file-path PPM/TGA readers the CLI uses) and
// gip_jpeg.cpp covers JPEG; this file closes the rest from scratch:
// GIF (LZW, interlace, transparency), BMP (palette / 16/24/32-bit,
// bitfields), PSD (composite, RAW + PackBits RLE, 8/16-bit), Radiance HDR
// (RGBE, old + new RLE, stb-compatible LDR tone map + an RLE writer),
// Softimage PIC (mixed RLE), binary PNM (P5/P6, 8/16-bit), and in-memory
// TGA (truecolor/gray/colormapped, RLE, 15/16/24/32-bpp).  Like the rest
// of the native tier these parse UNTRUSTED uploads, so every read is
// bounds-checked and every allocation is bounded by kGipMaxDecodePixels;
// the sanitized mutational fuzzer (tools/fuzz_codec.cpp) covers them all.
//
// C ABI only; bound from Python via ctypes (utils/native_codec.py).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "gip_limits.h"

namespace {

// Bounds-checked forward reader over the untrusted input buffer.
struct Reader {
  const uint8_t* p;
  size_t n;
  size_t pos = 0;

  bool ok(size_t k) const { return pos + k <= n; }
  bool skip(size_t k) {
    if (!ok(k)) return false;
    pos += k;
    return true;
  }
  bool u8(uint8_t* v) {
    if (!ok(1)) return false;
    *v = p[pos++];
    return true;
  }
  bool u16le(uint32_t* v) {
    if (!ok(2)) return false;
    *v = p[pos] | (uint32_t(p[pos + 1]) << 8);
    pos += 2;
    return true;
  }
  bool u16be(uint32_t* v) {
    if (!ok(2)) return false;
    *v = (uint32_t(p[pos]) << 8) | p[pos + 1];
    pos += 2;
    return true;
  }
  bool u32le(uint32_t* v) {
    if (!ok(4)) return false;
    *v = p[pos] | (uint32_t(p[pos + 1]) << 8) | (uint32_t(p[pos + 2]) << 16) |
         (uint32_t(p[pos + 3]) << 24);
    pos += 4;
    return true;
  }
  bool u32be(uint32_t* v) {
    if (!ok(4)) return false;
    *v = (uint32_t(p[pos]) << 24) | (uint32_t(p[pos + 1]) << 16) |
         (uint32_t(p[pos + 2]) << 8) | p[pos + 3];
    pos += 4;
    return true;
  }
};

uint8_t* alloc_out(size_t bytes) { return (uint8_t*)std::malloc(bytes); }

template <typename T>
int finish_any(std::vector<T>& img, int h, int w, int c, T** out_buf,
               int* out_h, int* out_w, int* out_c) {
  T* buf = (T*)std::malloc(img.size() * sizeof(T));
  if (!buf) return 6;
  std::memcpy(buf, img.data(), img.size() * sizeof(T));
  *out_buf = buf;
  *out_h = h;
  *out_w = w;
  *out_c = c;
  return 0;
}

int finish(std::vector<uint8_t>& img, int h, int w, int c, uint8_t** out_buf,
           int* out_h, int* out_w, int* out_c) {
  return finish_any(img, h, w, c, out_buf, out_h, out_w, out_c);
}

// ---------------------------------------------------------------------------
// GIF (87a/89a): first frame, composited onto the logical screen.
// ---------------------------------------------------------------------------

// LZW with the standard GIF variable code width (3..12 bits), deferred
// clear semantics, and output capped at the frame's pixel count.
bool gif_lzw(Reader& r, int min_code_size, std::vector<uint8_t>& out,
             size_t want) {
  if (min_code_size < 1 || min_code_size > 11) return false;
  const int clear = 1 << min_code_size;
  const int end = clear + 1;
  // prefix chain + final suffix byte per code
  int16_t prefix[4096];
  uint8_t suffix[4096];
  uint8_t first[4096];  // first byte of each code's expansion
  for (int i = 0; i < clear; ++i) {
    prefix[i] = -1;
    suffix[i] = (uint8_t)i;
    first[i] = (uint8_t)i;
  }
  int next_code = end + 1;
  int code_size = min_code_size + 1;
  int prev = -1;

  uint32_t bitbuf = 0;
  int bits = 0;
  uint8_t block_left = 0;
  uint8_t stack[4097];

  out.clear();
  out.reserve(want);
  for (;;) {
    while (bits < code_size) {
      if (block_left == 0) {
        if (!r.u8(&block_left)) return false;
        if (block_left == 0) return true;  // terminator: done (may be short)
      }
      uint8_t byte;
      if (!r.u8(&byte)) return false;
      --block_left;
      bitbuf |= uint32_t(byte) << bits;
      bits += 8;
    }
    int code = (int)(bitbuf & ((1u << code_size) - 1));
    bitbuf >>= code_size;
    bits -= code_size;

    if (code == clear) {
      next_code = end + 1;
      code_size = min_code_size + 1;
      prev = -1;
      continue;
    }
    if (code == end) {
      // Skip to the data terminator (remaining sub-blocks).
      while (block_left && r.skip(block_left)) block_left = 0;
      uint8_t len;
      while (r.u8(&len) && len) {
        if (!r.skip(len)) return false;
      }
      return true;
    }
    if (code >= 4096 || (code >= next_code && !(code == next_code && prev >= 0)))
      return false;

    int sp = 0;
    int emit_first;
    if (code == next_code) {
      // KwKwK case: expansion is prev's expansion + prev's first byte.
      stack[sp++] = first[prev];
      int cur = prev;
      while (cur >= 0) {
        stack[sp++] = suffix[cur];
        cur = prefix[cur];
        if (sp > 4096) return false;
      }
      emit_first = first[prev];
    } else {
      int cur = code;
      while (cur >= 0) {
        stack[sp++] = suffix[cur];
        cur = prefix[cur];
        if (sp > 4096) return false;
      }
      emit_first = first[code];
    }
    // stack holds the expansion reversed.
    while (sp > 0) {
      if (out.size() < want) out.push_back(stack[--sp]);
      else --sp;  // overflow pixels beyond the frame: ignore
    }

    if (prev >= 0 && next_code < 4096) {
      prefix[next_code] = (int16_t)prev;
      suffix[next_code] = (uint8_t)emit_first;
      first[next_code] = first[prev];
      ++next_code;
      if (next_code == (1 << code_size) && code_size < 12) ++code_size;
    }
    prev = code;
    if (out.size() >= want) {
      // Frame full: drain the remaining sub-blocks and stop.
      if (block_left && !r.skip(block_left)) return false;
      uint8_t len;
      while (r.u8(&len) && len) {
        if (!r.skip(len)) return false;
      }
      return true;
    }
  }
}

int gif_decode_impl(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    int* out_h, int* out_w, int* out_c) {
  Reader r{buf, len};
  if (len < 13) return 1;
  if (std::memcmp(buf, "GIF87a", 6) && std::memcmp(buf, "GIF89a", 6)) return 1;
  r.pos = 6;
  uint32_t sw, sh;
  uint8_t packed, bg, aspect;
  if (!r.u16le(&sw) || !r.u16le(&sh) || !r.u8(&packed) || !r.u8(&bg) ||
      !r.u8(&aspect))
    return 1;
  if (!sw || !sh || (uint64_t)sw * sh > kGipMaxDecodePixels) return 8;

  uint8_t gct[256][3];
  int gct_n = 0;
  if (packed & 0x80) {
    gct_n = 2 << (packed & 7);
    if (!r.ok((size_t)gct_n * 3)) return 1;
    for (int i = 0; i < gct_n; ++i) {
      gct[i][0] = buf[r.pos + i * 3];
      gct[i][1] = buf[r.pos + i * 3 + 1];
      gct[i][2] = buf[r.pos + i * 3 + 2];
    }
    r.pos += (size_t)gct_n * 3;
  }

  int transparent = -1;
  for (;;) {
    uint8_t block;
    if (!r.u8(&block)) return 1;
    if (block == 0x3B) return 2;  // trailer before any image
    if (block == 0x21) {          // extension
      uint8_t label;
      if (!r.u8(&label)) return 1;
      if (label == 0xF9) {  // graphic control: transparency for the NEXT image
        uint8_t blen;
        if (!r.u8(&blen)) return 1;
        if (blen >= 4 && r.ok(blen)) {  // bounds BEFORE the peeks: a file
          uint8_t gce_packed = buf[r.pos];  // truncated inside the GCE must
          uint8_t tindex = buf[r.pos + 3];  // not read past the buffer
          r.pos += blen;
          if (gce_packed & 1) transparent = tindex;
        } else if (!r.skip(blen)) {
          return 1;
        }
        uint8_t z;
        while (r.u8(&z) && z)
          if (!r.skip(z)) return 1;
      } else {  // comment / plain text / application: skip sub-blocks
        uint8_t blen;
        while (r.u8(&blen) && blen)
          if (!r.skip(blen)) return 1;
      }
      continue;
    }
    if (block != 0x2C) return 1;  // image descriptor expected

    uint32_t fx, fy, fw, fh;
    uint8_t fpacked;
    if (!r.u16le(&fx) || !r.u16le(&fy) || !r.u16le(&fw) || !r.u16le(&fh) ||
        !r.u8(&fpacked))
      return 1;
    if (!fw || !fh || fx + fw > sw || fy + fh > sh) return 3;
    bool interlaced = (fpacked & 0x40) != 0;
    uint8_t lct[256][3];
    const uint8_t(*pal)[3] = gct;
    int pal_n = gct_n;
    if (fpacked & 0x80) {
      pal_n = 2 << (fpacked & 7);
      if (!r.ok((size_t)pal_n * 3)) return 1;
      for (int i = 0; i < pal_n; ++i) {
        lct[i][0] = buf[r.pos + i * 3];
        lct[i][1] = buf[r.pos + i * 3 + 1];
        lct[i][2] = buf[r.pos + i * 3 + 2];
      }
      r.pos += (size_t)pal_n * 3;
      pal = lct;
    }
    if (pal_n == 0) return 4;  // no color table at all

    uint8_t mcs;
    if (!r.u8(&mcs)) return 1;
    std::vector<uint8_t> idx;
    if (!gif_lzw(r, mcs, idx, (size_t)fw * fh)) return 5;
    if (idx.size() < (size_t)fw * fh) idx.resize((size_t)fw * fh, 0);

    const int c = transparent >= 0 ? 4 : 3;
    std::vector<uint8_t> img((size_t)sw * sh * c, 0);
    if (c == 3 && gct_n > 0 && bg < gct_n) {
      // Uncovered canvas shows the background color (89a semantics).
      for (size_t i = 0; i < (size_t)sw * sh; ++i) {
        img[i * 3] = gct[bg][0];
        img[i * 3 + 1] = gct[bg][1];
        img[i * 3 + 2] = gct[bg][2];
      }
    }

    // Interlace pass structure: rows 0,8,16.. then 4,12.. then 2,6.. then
    // 1,3,5..
    static const int start[4] = {0, 4, 2, 1};
    static const int step[4] = {8, 8, 4, 2};
    size_t src = 0;
    for (int pass = 0; pass < (interlaced ? 4 : 1); ++pass) {
      int y0 = interlaced ? start[pass] : 0;
      int dy = interlaced ? step[pass] : 1;
      for (uint32_t y = y0; y < fh; y += dy) {
        uint8_t* dst = img.data() + (((size_t)(fy + y) * sw) + fx) * c;
        for (uint32_t x = 0; x < fw; ++x, ++src) {
          uint8_t k = idx[src];
          bool transp = (int)k == transparent;
          if (k >= pal_n) k = 0;
          // Transparent pixels keep their palette RGB under alpha 0
          // (PIL-compatible; the RGB is invisible either way).
          *dst++ = pal[k][0];
          *dst++ = pal[k][1];
          *dst++ = pal[k][2];
          if (c == 4) *dst++ = transp ? 0 : 255;
        }
      }
      if (!interlaced) break;
    }
    return finish(img, (int)sh, (int)sw, c, out_buf, out_h, out_w, out_c);
  }
}

// ---------------------------------------------------------------------------
// GIF animation: every frame composited with disposal semantics.
//
// The analog of stb's stbi_load_gif_from_memory
// (/root/reference/external/stb_image.h:433,1444): frames are emitted as
// full logical-screen RGBA canvases stacked (frames, H, W, 4), with
// per-frame delays in MILLISECONDS (GIF stores centiseconds; stb scales by
// 10 at stb_image.h:6916, and PIL's info["duration"] agrees).  Compositing
// follows stb's model (stb_image.h:6779-6906): the canvas starts
// transparent; disposal 2 restores the pre-previous-frame snapshot over
// the pixels the previous frame touched; disposal 3 restores the frame
// from two emitted frames back (downgraded to 2 when there is none);
// transparent pixels never touch the canvas; on the FIRST frame only,
// untouched pixels take the background color when bgindex > 0.
// ---------------------------------------------------------------------------

int gif_frames_impl(const uint8_t* buf, size_t len, int max_frames,
                    uint8_t** out_buf, int** out_delays, int* out_frames,
                    int* out_h, int* out_w, int* out_c) {
  Reader r{buf, len};
  if (len < 13) return 1;
  if (std::memcmp(buf, "GIF87a", 6) && std::memcmp(buf, "GIF89a", 6)) return 1;
  r.pos = 6;
  uint32_t sw, sh;
  uint8_t packed, bg, aspect;
  if (!r.u16le(&sw) || !r.u16le(&sh) || !r.u8(&packed) || !r.u8(&bg) ||
      !r.u8(&aspect))
    return 1;
  if (!sw || !sh || (uint64_t)sw * sh > kGipMaxDecodePixels) return 8;

  uint8_t gct[256][3];
  int gct_n = 0;
  if (packed & 0x80) {
    gct_n = 2 << (packed & 7);
    if (!r.ok((size_t)gct_n * 3)) return 1;
    for (int i = 0; i < gct_n; ++i) {
      gct[i][0] = buf[r.pos + i * 3];
      gct[i][1] = buf[r.pos + i * 3 + 1];
      gct[i][2] = buf[r.pos + i * 3 + 2];
    }
    r.pos += (size_t)gct_n * 3;
  }

  const size_t pcount = (size_t)sw * sh;
  std::vector<uint8_t> canvas(pcount * 4, 0);      // current composite
  std::vector<uint8_t> background(pcount * 4, 0);  // canvas before last draw
  std::vector<uint8_t> history(pcount, 0);  // pixels the LAST frame touched
  // Emitted canvases, stacked, in a realloc-grown malloc buffer handed to
  // the caller WITHOUT a final copy: a vector + alloc_out/memcpy doubled
  // peak memory at up-to-716 MB animations (glibc extends large blocks
  // with mremap, so the per-frame exact-growth realloc is in-place).
  struct MallocBuf {
    uint8_t* p = nullptr;
    size_t size = 0, cap = 0;
    ~MallocBuf() { std::free(p); }
    bool append(const uint8_t* d, size_t k) {
      if (size + k > cap) {
        uint8_t* np = (uint8_t*)std::realloc(p, size + k);
        if (!np) return false;
        p = np;
        cap = size + k;
      }
      std::memcpy(p + size, d, k);
      size += k;
      return true;
    }
    uint8_t* release() {
      uint8_t* q = p;
      p = nullptr;
      return q;
    }
  } frames;
  std::vector<int> delays;

  // GCE state is sticky across frames when a frame has no GCE of its own
  // (stb keeps g->delay / g->eflags; stb_image.h:6914-6916).  A GCE
  // applies to the image it PRECEDES, so the disposal used to undo frame
  // k before drawing frame k+1 is frame k's own (prev_dispose), not the
  // value just parsed from frame k+1's GCE.
  int transparent = -1;
  int dispose = 0;
  int prev_dispose = 0;
  int delay_ms = 0;

  for (;;) {
    uint8_t block;
    if (!r.u8(&block)) break;  // truncated tail: keep the frames we have
    if (block == 0x3B) break;  // trailer
    if (block == 0x21) {       // extension
      uint8_t label;
      if (!r.u8(&label)) break;
      if (label == 0xF9) {
        uint8_t blen;
        if (!r.u8(&blen)) break;
        if (blen >= 4 && r.ok(blen)) {
          uint8_t gce_packed = buf[r.pos];
          delay_ms = 10 * (buf[r.pos + 1] | (int(buf[r.pos + 2]) << 8));
          uint8_t tindex = buf[r.pos + 3];
          r.pos += blen;
          dispose = (gce_packed >> 2) & 7;
          transparent = (gce_packed & 1) ? tindex : -1;
        } else if (!r.skip(blen)) {
          break;
        }
      } else {
        uint8_t blen;
        while (r.u8(&blen) && blen)
          if (!r.skip(blen)) { blen = 0; break; }
        if (r.pos >= r.n) break;
        continue;
      }
      uint8_t z;
      while (r.u8(&z) && z)
        if (!r.skip(z)) break;
      continue;
    }
    if (block != 0x2C) break;  // unknown block: stop at what we decoded

    const int nframe = (int)delays.size();
    if (nframe > 0) {
      // Dispose of the previous frame before drawing this one.
      int d = prev_dispose;
      if (d == 3 && nframe < 2) d = 2;  // no frame to revert to
      if (d == 3) {
        const uint8_t* two_back =
            frames.p + (size_t)(nframe - 2) * pcount * 4;
        for (size_t pi = 0; pi < pcount; ++pi)
          if (history[pi])
            std::memcpy(&canvas[pi * 4], &two_back[pi * 4], 4);
      } else if (d == 2) {
        for (size_t pi = 0; pi < pcount; ++pi)
          if (history[pi])
            std::memcpy(&canvas[pi * 4], &background[pi * 4], 4);
      }
      std::memcpy(background.data(), canvas.data(), pcount * 4);
    }
    std::fill(history.begin(), history.end(), 0);

    uint32_t fx, fy, fw, fh;
    uint8_t fpacked;
    if (!r.u16le(&fx) || !r.u16le(&fy) || !r.u16le(&fw) || !r.u16le(&fh) ||
        !r.u8(&fpacked)) {
      if (delays.empty()) return 1;
      break;  // truncated descriptor: keep the frames already decoded
    }
    if (!fw || !fh || fx + fw > sw || fy + fh > sh) return 3;
    bool interlaced = (fpacked & 0x40) != 0;
    uint8_t lct[256][3];
    const uint8_t(*pal)[3] = gct;
    int pal_n = gct_n;
    if (fpacked & 0x80) {
      pal_n = 2 << (fpacked & 7);
      if (!r.ok((size_t)pal_n * 3)) return 1;
      for (int i = 0; i < pal_n; ++i) {
        lct[i][0] = buf[r.pos + i * 3];
        lct[i][1] = buf[r.pos + i * 3 + 1];
        lct[i][2] = buf[r.pos + i * 3 + 2];
      }
      r.pos += (size_t)pal_n * 3;
      pal = lct;
    }
    if (pal_n == 0) return 4;

    uint8_t mcs;
    if (!r.u8(&mcs)) return 1;
    std::vector<uint8_t> idx;
    if (!gif_lzw(r, mcs, idx, (size_t)fw * fh)) return 5;
    if (idx.size() < (size_t)fw * fh) idx.resize((size_t)fw * fh, 0);

    static const int start[4] = {0, 4, 2, 1};
    static const int step[4] = {8, 8, 4, 2};
    size_t src = 0;
    for (int pass = 0; pass < (interlaced ? 4 : 1); ++pass) {
      int y0 = interlaced ? start[pass] : 0;
      int dy = interlaced ? step[pass] : 1;
      for (uint32_t y = y0; y < fh; y += dy) {
        size_t pi = (size_t)(fy + y) * sw + fx;
        for (uint32_t x = 0; x < fw; ++x, ++src, ++pi) {
          uint8_t k = idx[src];
          if ((int)k == transparent) continue;  // canvas shows through
          if (k >= pal_n) k = 0;
          canvas[pi * 4] = pal[k][0];
          canvas[pi * 4 + 1] = pal[k][1];
          canvas[pi * 4 + 2] = pal[k][2];
          canvas[pi * 4 + 3] = 255;
          history[pi] = 1;
        }
      }
      if (!interlaced) break;
    }

    if (nframe == 0 && bg > 0 && bg < gct_n) {
      // First frame: untouched canvas takes the (opaque) background color.
      for (size_t pi = 0; pi < pcount; ++pi) {
        if (!history[pi]) {
          canvas[pi * 4] = gct[bg][0];
          canvas[pi * 4 + 1] = gct[bg][1];
          canvas[pi * 4 + 2] = gct[bg][2];
          canvas[pi * 4 + 3] = 255;
        }
      }
    }

    // Bound TOTAL output: an animation bomb (tiny file, thousands of
    // frames) is capped the same way a single oversized image is.
    if ((uint64_t)(nframe + 1) * pcount > kGipMaxDecodePixels) return 8;
    if (!frames.append(canvas.data(), canvas.size())) return 6;
    delays.push_back(delay_ms);
    prev_dispose = dispose;
    if (max_frames > 0 && (int)delays.size() >= max_frames) break;
  }

  if (delays.empty()) return 2;  // no image data before the trailer
  int* dbuf = (int*)std::malloc(delays.size() * sizeof(int));
  if (!dbuf) return 6;
  std::memcpy(dbuf, delays.data(), delays.size() * sizeof(int));
  uint8_t* fbuf = frames.release();  // zero-copy handoff; freed by caller
  *out_buf = fbuf;
  *out_delays = dbuf;
  *out_frames = (int)delays.size();
  *out_h = (int)sh;
  *out_w = (int)sw;
  *out_c = 4;
  return 0;
}

// ---------------------------------------------------------------------------
// BMP: 1/4/8-bit palette, 16/24/32-bit, BI_RGB + BI_BITFIELDS.
// ---------------------------------------------------------------------------

// Scale an n-bit mask-extracted field to 8 bits (replicating high bits).
uint8_t scale_field(uint32_t v, uint32_t mask) {
  if (!mask) return 0;
  int shift = 0;
  while (!((mask >> shift) & 1)) ++shift;
  uint32_t m = mask >> shift;
  uint32_t x = (v & mask) >> shift;
  // Bit-replicate to 8 bits: works for any contiguous mask width 1..8.
  // A hostile 32-bit-wide mask would otherwise drive m >> 32 (UB, found
  // by the fuzzer).
  int width = 0;
  while (width < 32 && ((m >> width) & 1)) ++width;
  if (width >= 8) return (uint8_t)(x >> (width - 8));
  uint32_t out = x << (8 - width);
  int filled = width;
  while (filled < 8) {
    out |= out >> filled;
    filled *= 2;
  }
  return (uint8_t)out;
}

int bmp_decode_impl(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    int* out_h, int* out_w, int* out_c) {
  Reader r{buf, len};
  if (len < 54 || buf[0] != 'B' || buf[1] != 'M') return 1;
  r.pos = 10;
  uint32_t data_off, hdr_size;
  if (!r.u32le(&data_off) || !r.u32le(&hdr_size)) return 1;
  if (hdr_size < 40 || hdr_size > 1024) return 2;  // core headers unsupported
  uint32_t wu, hu;
  if (!r.u32le(&wu) || !r.u32le(&hu)) return 1;
  int32_t ws = (int32_t)wu, hs = (int32_t)hu;
  bool top_down = hs < 0;
  int64_t w = ws, h = top_down ? -(int64_t)hs : hs;
  uint32_t planes_bpp, compression, img_size, junk, pal_used;
  if (!r.u16le(&planes_bpp)) return 1;
  uint32_t bpp;
  if (!r.u16le(&bpp) || !r.u32le(&compression) || !r.u32le(&img_size) ||
      !r.u32le(&junk) || !r.u32le(&junk) || !r.u32le(&pal_used) ||
      !r.u32le(&junk))
    return 1;
  if (w <= 0 || h <= 0 || (uint64_t)w * h > kGipMaxDecodePixels) return 8;
  if (compression != 0 && compression != 3) return 3;  // no RLE4/RLE8
  if (bpp != 1 && bpp != 4 && bpp != 8 && bpp != 16 && bpp != 24 && bpp != 32)
    return 3;

  uint32_t rmask = 0, gmask = 0, bmask = 0, amask = 0;
  if (compression == 3) {
    if (bpp != 16 && bpp != 32) return 3;
    // Masks live in the header (size >= 52/56) or right after a 40-byte one.
    size_t mask_at = hdr_size >= 52 ? 14 + 40 : r.pos;
    Reader mr{buf, len};
    mr.pos = mask_at;
    if (!mr.u32le(&rmask) || !mr.u32le(&gmask) || !mr.u32le(&bmask)) return 1;
    // The alpha mask exists only in V3+ headers (>= 56 bytes); a 40-byte
    // header's BI_BITFIELDS carries exactly three masks after it.
    if (hdr_size >= 56) mr.u32le(&amask);
    if (!rmask || !gmask || !bmask) return 3;
  } else if (bpp == 16) {
    rmask = 0x7C00;
    gmask = 0x03E0;
    bmask = 0x001F;
  } else if (bpp == 32) {
    rmask = 0x00FF0000;
    gmask = 0x0000FF00;
    bmask = 0x000000FF;
    amask = 0xFF000000;
  }

  // Palette (after the DIB header) for <=8 bpp.
  uint8_t pal[256][3];
  int pal_n = 0;
  if (bpp <= 8) {
    pal_n = pal_used ? (int)pal_used : (1 << bpp);
    if (pal_n > 256) return 3;
    size_t pal_at = 14 + hdr_size;
    if (pal_at + (size_t)pal_n * 4 > len) return 1;
    for (int i = 0; i < pal_n; ++i) {
      pal[i][2] = buf[pal_at + i * 4];      // B
      pal[i][1] = buf[pal_at + i * 4 + 1];  // G
      pal[i][0] = buf[pal_at + i * 4 + 2];  // R
    }
  }

  const int c = (bpp == 32 && amask) ? 4 : 3;
  size_t row_bytes = (((size_t)w * bpp + 31) / 32) * 4;
  if (data_off > len || row_bytes * (size_t)h > len - data_off) return 5;

  std::vector<uint8_t> img((size_t)w * h * c);
  bool any_alpha = false;
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* src = buf + data_off + row_bytes * (top_down ? y : h - 1 - y);
    uint8_t* dst = img.data() + (size_t)y * w * c;
    if (bpp == 24) {
      for (int64_t x = 0; x < w; ++x) {
        dst[x * 3] = src[x * 3 + 2];
        dst[x * 3 + 1] = src[x * 3 + 1];
        dst[x * 3 + 2] = src[x * 3];
      }
    } else if (bpp == 32) {
      for (int64_t x = 0; x < w; ++x) {
        uint32_t v = src[x * 4] | (uint32_t(src[x * 4 + 1]) << 8) |
                     (uint32_t(src[x * 4 + 2]) << 16) |
                     (uint32_t(src[x * 4 + 3]) << 24);
        dst[x * c] = scale_field(v, rmask);
        dst[x * c + 1] = scale_field(v, gmask);
        dst[x * c + 2] = scale_field(v, bmask);
        if (c == 4) {
          uint8_t a = scale_field(v, amask);
          dst[x * c + 3] = a;
          any_alpha |= a != 0;
        }
      }
    } else if (bpp == 16) {
      for (int64_t x = 0; x < w; ++x) {
        uint32_t v = src[x * 2] | (uint32_t(src[x * 2 + 1]) << 8);
        dst[x * 3] = scale_field(v, rmask);
        dst[x * 3 + 1] = scale_field(v, gmask);
        dst[x * 3 + 2] = scale_field(v, bmask);
      }
    } else {  // palette 1/4/8
      for (int64_t x = 0; x < w; ++x) {
        int k;
        if (bpp == 8) k = src[x];
        else if (bpp == 4) k = (src[x / 2] >> (x % 2 ? 0 : 4)) & 0xF;
        else k = (src[x / 8] >> (7 - x % 8)) & 1;
        if (k >= pal_n) k = 0;
        dst[x * 3] = pal[k][0];
        dst[x * 3 + 1] = pal[k][1];
        dst[x * 3 + 2] = pal[k][2];
      }
    }
  }
  if (c == 4 && !any_alpha) {
    // Common 32-bpp files carry an all-zero alpha plane meaning "opaque".
    for (int64_t i = 0; i < w * h; ++i) img[(size_t)i * 4 + 3] = 255;
  }
  return finish(img, (int)h, (int)w, c, out_buf, out_h, out_w, out_c);
}

// ---------------------------------------------------------------------------
// PSD: composite image data, RGB or grayscale, 8/16-bit, RAW or PackBits.
// ---------------------------------------------------------------------------

// PackBits one plane row-stream into `out` (exactly out_n bytes).
bool packbits(Reader& r, uint8_t* out, size_t out_n) {
  size_t o = 0;
  while (o < out_n) {
    uint8_t nb;
    if (!r.u8(&nb)) return false;
    int8_t sn = (int8_t)nb;
    if (sn >= 0) {
      size_t cnt = (size_t)sn + 1;
      if (cnt > out_n - o || !r.ok(cnt)) return false;
      std::memcpy(out + o, r.p + r.pos, cnt);
      r.pos += cnt;
      o += cnt;
    } else if (sn != -128) {
      size_t cnt = (size_t)(1 - (int)sn);
      uint8_t v;
      if (cnt > out_n - o || !r.u8(&v)) return false;
      std::memset(out + o, v, cnt);
      o += cnt;
    }
  }
  return true;
}

// Exactly one of out_buf (8-bit) / out_buf16 (16-bit) is non-null.  The
// 16-bit path is the stbi_load_16 analog (stb_image.h:445-449): depth-16
// planes pass through natively (big-endian pairs), 8-bit planes upscale
// v -> v*257; the 8-bit path keeps stb's 16->8 high-byte reduction.
int psd_decode_core(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    uint16_t** out_buf16, int* out_h, int* out_w,
                    int* out_c) {
  Reader r{buf, len};
  if (len < 26 + 4 * 3 + 2 || std::memcmp(buf, "8BPS", 4)) return 1;
  r.pos = 4;
  uint32_t version;
  if (!r.u16be(&version) || version != 1) return 2;
  if (!r.skip(6)) return 1;
  uint32_t channels, height, width, depth, mode;
  if (!r.u16be(&channels) || !r.u32be(&height) || !r.u32be(&width) ||
      !r.u16be(&depth) || !r.u16be(&mode))
    return 1;
  if (channels < 1 || channels > 16) return 2;
  if (depth != 8 && depth != 16) return 2;
  if (mode != 3 && mode != 1) return 2;  // RGB or grayscale
  if (!width || !height || (uint64_t)width * height > kGipMaxDecodePixels)
    return 8;
  // Skip color mode data, image resources, layer & mask sections.
  for (int i = 0; i < 3; ++i) {
    uint32_t sect;
    if (!r.u32be(&sect) || !r.skip(sect)) return 1;
  }
  uint32_t compression;
  if (!r.u16be(&compression) || compression > 1) return 3;

  // Channel semantics: RGB mode -> R,G,B[,A]; gray -> Y[,A].
  const int base = mode == 3 ? 3 : 1;
  const int c = (int)channels > base ? base + 1 : base;
  const int keep = c;  // planes we keep; extra channels are skipped

  const bool want16 = out_buf16 != nullptr;
  const size_t wh = (size_t)width * height;
  const size_t plane_bytes = wh * (depth / 8);
  std::vector<uint8_t> plane(plane_bytes);
  std::vector<uint8_t> img(want16 ? 0 : wh * keep);
  std::vector<uint16_t> img16(want16 ? wh * keep : 0);

  if (compression == 1) {
    // Row-length table: height * channels big-endian u16s.  The PackBits
    // decoder below re-derives row boundaries from the stream itself, so
    // the table is validated-and-skipped, not consumed.
    if (!r.skip((size_t)height * channels * 2)) return 1;
  }

  for (uint32_t ch = 0; ch < channels; ++ch) {
    if (compression == 0) {
      if (!r.ok(plane_bytes)) return 5;
      std::memcpy(plane.data(), r.p + r.pos, plane_bytes);
      r.pos += plane_bytes;
    } else {
      // PackBits rows; 16-bit RLE PSDs exist but are rare -- rows still
      // decode to width*2 bytes each.
      size_t row_n = (size_t)width * (depth / 8);
      for (uint32_t y = 0; y < height; ++y) {
        if (!packbits(r, plane.data() + (size_t)y * row_n, row_n)) return 5;
      }
    }
    if ((int)ch >= keep) continue;  // parsed (stream position advanced), unused
    if (want16) {
      if (depth == 8) {
        for (size_t i = 0; i < wh; ++i)
          img16[i * keep + ch] = (uint16_t)(plane[i] * 257);
      } else {
        for (size_t i = 0; i < wh; ++i)
          img16[i * keep + ch] =
              (uint16_t)((plane[i * 2] << 8) | plane[i * 2 + 1]);
      }
    } else if (depth == 8) {
      for (size_t i = 0; i < wh; ++i) img[i * keep + ch] = plane[i];
    } else {
      for (size_t i = 0; i < wh; ++i) img[i * keep + ch] = plane[i * 2];
    }
  }
  if (want16)
    return finish_any(img16, (int)height, (int)width, keep, out_buf16,
                      out_h, out_w, out_c);
  return finish(img, (int)height, (int)width, keep, out_buf, out_h, out_w,
                out_c);
}

int psd_decode_impl(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    int* out_h, int* out_w, int* out_c) {
  return psd_decode_core(buf, len, out_buf, nullptr, out_h, out_w, out_c);
}

// ---------------------------------------------------------------------------
// Radiance HDR (.hdr / .pic RGBE): -Y +X orientation, old + new RLE.
// LDR conversion matches stb's default tone map: scale 1, gamma 2.2.
// ---------------------------------------------------------------------------

bool hdr_line(Reader& r, char* out, size_t cap) {
  size_t o = 0;
  uint8_t ch;
  while (r.u8(&ch)) {
    if (ch == '\n') {
      out[o] = 0;
      return true;
    }
    if (o + 1 < cap) out[o++] = (char)ch;
  }
  return false;
}

uint8_t rgbe_to_u8(uint8_t m, int e) {
  if (e == 0) return 0;
  float v = (float)m * std::ldexp(1.0f, e - 136);  // m * 2^(e-128-8)
  float z = std::pow(v, 1.0f / 2.2f) * 255.0f + 0.5f;
  if (!(z > 0.0f)) return 0;  // also catches NaN
  if (z > 255.0f) return 255;
  return (uint8_t)z;
}

// Linear float from one RGBE channel -- stbi__hdr_convert's math
// (stb_image.h:7470-7486): m * 2^(e-128-8), 0 when the exponent is 0.
float rgbe_to_f(uint8_t m, int e) {
  if (e == 0) return 0.0f;
  return (float)m * std::ldexp(1.0f, e - 136);
}

// Exactly one of out_buf (LDR uint8, stb's default tone map) /
// out_buff (linear float RGB, the stbi_loadf analog) is non-null.
int hdr_decode_core(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    float** out_buff, int* out_h, int* out_w,
                    int* out_c) {
  Reader r{buf, len};
  char line[256];
  if (!hdr_line(r, line, sizeof line)) return 1;
  if (std::strcmp(line, "#?RADIANCE") && std::strcmp(line, "#?RGBE")) return 1;
  bool fmt_ok = false;
  for (;;) {
    if (!hdr_line(r, line, sizeof line)) return 1;
    if (line[0] == 0) break;  // blank line ends the header
    if (!std::strcmp(line, "FORMAT=32-bit_rle_rgbe")) fmt_ok = true;
  }
  if (!fmt_ok) return 2;
  if (!hdr_line(r, line, sizeof line)) return 1;
  long hh = 0, ww = 0;
  {
    // Only the standard "-Y <h> +X <w>" orientation is supported.
    char* s = line;
    if (std::strncmp(s, "-Y ", 3)) return 3;
    char* endp = nullptr;
    hh = std::strtol(s + 3, &endp, 10);
    if (!endp || std::strncmp(endp, " +X ", 4)) return 3;
    ww = std::strtol(endp + 4, &endp, 10);
  }
  if (hh <= 0 || ww <= 0 || (uint64_t)ww * hh > kGipMaxDecodePixels) return 8;
  const int w = (int)ww, h = (int)hh;

  const bool wantf = out_buff != nullptr;
  std::vector<uint8_t> img(wantf ? 0 : (size_t)w * h * 3);
  std::vector<float> imgf(wantf ? (size_t)w * h * 3 : 0);
  std::vector<uint8_t> scan((size_t)w * 4);

  // Old-format run state persists ACROSS scanlines (the stream is one
  // pixel sequence; a run marker at a row start repeats the previous
  // row's last pixel).
  int old_shift = 0;
  uint8_t old_prev[4] = {0, 0, 0, 0};
  bool old_seen = false;

  for (int y = 0; y < h; ++y) {
    // Peek the scanline type: new-RLE starts 0x02 0x02 hi lo with
    // (hi<<8|lo) == width (the spec caps new-RLE widths to [8, 32767]).
    bool new_rle = false;
    if (w >= 8 && w < 32768 && r.ok(4) && r.p[r.pos] == 2 &&
        r.p[r.pos + 1] == 2 &&
        ((int(r.p[r.pos + 2]) << 8) | r.p[r.pos + 3]) == w) {
      new_rle = true;
      r.pos += 4;
    }
    if (new_rle) {
      // Four planes, each RLE: count>128 = run of (count-128), else literals.
      for (int k = 0; k < 4; ++k) {
        int x = 0;
        while (x < w) {
          uint8_t cnt;
          if (!r.u8(&cnt)) return 5;
          if (cnt > 128) {
            int run = cnt - 128;
            uint8_t v;
            if (run > w - x || !r.u8(&v)) return 5;
            while (run--) scan[(size_t)(x++) * 4 + k] = v;
          } else {
            int lit = cnt;
            if (lit == 0 || lit > w - x || !r.ok((size_t)lit)) return 5;
            while (lit--) scan[(size_t)(x++) * 4 + k] = r.p[r.pos++];
          }
        }
      }
    } else {
      // Flat RGBE quadruples with old-style (1,1,1,count) run markers.
      int x = 0;
      while (x < w) {
        uint8_t q[4];
        if (!r.ok(4)) return 5;
        std::memcpy(q, r.p + r.pos, 4);
        r.pos += 4;
        if (q[0] == 1 && q[1] == 1 && q[2] == 1) {
          long run = (long)q[3] << old_shift;
          if (!old_seen || run > w - x) return 5;
          while (run--) {
            std::memcpy(&scan[(size_t)x * 4], old_prev, 4);
            ++x;
          }
          old_shift += 8;
          if (old_shift > 24) return 5;
        } else {
          std::memcpy(&scan[(size_t)x * 4], q, 4);
          std::memcpy(old_prev, q, 4);
          old_seen = true;
          ++x;
          old_shift = 0;
        }
      }
    }
    if (wantf) {
      float* dst = imgf.data() + (size_t)y * w * 3;
      for (int x = 0; x < w; ++x) {
        int e = scan[(size_t)x * 4 + 3];
        dst[x * 3] = rgbe_to_f(scan[(size_t)x * 4], e);
        dst[x * 3 + 1] = rgbe_to_f(scan[(size_t)x * 4 + 1], e);
        dst[x * 3 + 2] = rgbe_to_f(scan[(size_t)x * 4 + 2], e);
      }
    } else {
      uint8_t* dst = img.data() + (size_t)y * w * 3;
      for (int x = 0; x < w; ++x) {
        int e = scan[(size_t)x * 4 + 3];
        dst[x * 3] = rgbe_to_u8(scan[(size_t)x * 4], e);
        dst[x * 3 + 1] = rgbe_to_u8(scan[(size_t)x * 4 + 1], e);
        dst[x * 3 + 2] = rgbe_to_u8(scan[(size_t)x * 4 + 2], e);
      }
    }
  }
  if (wantf) return finish_any(imgf, h, w, 3, out_buff, out_h, out_w, out_c);
  return finish(img, h, w, 3, out_buf, out_h, out_w, out_c);
}

int hdr_decode_impl(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    int* out_h, int* out_w, int* out_c) {
  return hdr_decode_core(buf, len, out_buf, nullptr, out_h, out_w, out_c);
}

// ---------------------------------------------------------------------------
// Softimage PIC: 8-bit channel packets, uncompressed or mixed RLE.
// ---------------------------------------------------------------------------

struct PicPacket {
  uint8_t type;     // 0 = uncompressed, 2 = mixed RLE
  uint8_t mask;     // channel bits: 0x80 R, 0x40 G, 0x20 B, 0x10 A
  int nch;          // popcount of mask
  int map[4];       // packet slot -> output channel index
};

int pic_decode_impl(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    int* out_h, int* out_w, int* out_c) {
  Reader r{buf, len};
  uint32_t magic;
  if (!r.u32be(&magic) || magic != 0x5380F634u) return 1;
  if (!r.skip(4 + 80)) return 1;  // version float + comment
  if (!r.ok(4) || std::memcmp(r.p + r.pos, "PICT", 4)) return 1;
  r.pos += 4;
  uint32_t w, h;
  if (!r.u16be(&w) || !r.u16be(&h)) return 1;
  if (!r.skip(4 + 2 + 2)) return 1;  // ratio + fields + pad
  if (!w || !h || (uint64_t)w * h > kGipMaxDecodePixels) return 8;

  // Channel packet directory (chained).
  PicPacket pk[8];
  int npk = 0;
  bool has_alpha = false;
  for (;;) {
    uint8_t chained, size, type, mask;
    if (!r.u8(&chained) || !r.u8(&size) || !r.u8(&type) || !r.u8(&mask))
      return 1;
    if (size != 8 || (type != 0 && type != 2)) return 2;
    if (npk >= 8 || (mask & 0x0F)) return 2;
    PicPacket& p = pk[npk++];
    p.type = type;
    p.mask = mask;
    p.nch = 0;
    static const uint8_t bits[4] = {0x80, 0x40, 0x20, 0x10};
    for (int i = 0; i < 4; ++i) {
      if (mask & bits[i]) {
        p.map[p.nch++] = i;
        if (i == 3) has_alpha = true;
      }
    }
    if (p.nch == 0) return 2;
    if (!chained) break;
  }

  const int c = has_alpha ? 4 : 3;
  std::vector<uint8_t> img((size_t)w * h * c, 0);
  std::vector<uint8_t> px(4);

  for (uint32_t y = 0; y < h; ++y) {
    uint8_t* row = img.data() + (size_t)y * w * c;
    for (int ip = 0; ip < npk; ++ip) {
      const PicPacket& p = pk[ip];
      auto put = [&](uint32_t x, const uint8_t* v) {
        for (int k = 0; k < p.nch; ++k) {
          int oc = p.map[k];
          if (oc < c) row[(size_t)x * c + oc] = v[k];
        }
      };
      if (p.type == 0) {
        if (!r.ok((size_t)w * p.nch)) return 5;
        for (uint32_t x = 0; x < w; ++x) put(x, r.p + r.pos + (size_t)x * p.nch);
        r.pos += (size_t)w * p.nch;
      } else {
        uint32_t x = 0;
        while (x < w) {
          uint8_t cnt;
          if (!r.u8(&cnt)) return 5;
          if (cnt >= 128) {
            uint32_t run;
            if (cnt == 128) {
              uint32_t big;
              if (!r.u16be(&big)) return 5;
              run = big;
            } else {
              run = (uint32_t)cnt - 127;
            }
            if (run > w - x || !r.ok((size_t)p.nch)) return 5;
            std::memcpy(px.data(), r.p + r.pos, p.nch);
            r.pos += p.nch;
            while (run--) put(x++, px.data());
          } else {
            uint32_t lit = (uint32_t)cnt + 1;
            if (lit > w - x || !r.ok((size_t)lit * p.nch)) return 5;
            for (uint32_t i = 0; i < lit; ++i)
              put(x + i, r.p + r.pos + (size_t)i * p.nch);
            r.pos += (size_t)lit * p.nch;
            x += lit;
          }
        }
      }
    }
  }
  return finish(img, (int)h, (int)w, c, out_buf, out_h, out_w, out_c);
}

// ---------------------------------------------------------------------------
// Binary PNM (P5 gray / P6 RGB), 8- and 16-bit.  stb parity notes
// (stb_image.h:139 "PNM (.ppm and .pgm binary only)"): values are returned
// raw for maxval <= 255 (no rescale — stb does the same), and 16-bit
// samples convert to 8-bit by taking the high byte (stb's 16→8 is `v >> 8`).
// ---------------------------------------------------------------------------

bool pnm_token(Reader& r, long* out_val) {
  // Skip whitespace and '#' comments, then parse a decimal integer.
  uint8_t ch;
  for (;;) {
    if (!r.u8(&ch)) return false;
    if (ch == '#') {
      while (r.u8(&ch) && ch != '\n') {
      }
      continue;
    }
    if (!isspace(ch)) break;
  }
  if (ch < '0' || ch > '9') return false;
  long v = ch - '0';
  while (r.ok(1) && r.p[r.pos] >= '0' && r.p[r.pos] <= '9') {
    v = v * 10 + (r.p[r.pos++] - '0');
    if (v > 0x7FFFFFFFL) return false;
  }
  *out_val = v;
  return true;
}

int pnm_decode_impl(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    int* out_h, int* out_w, int* out_c) {
  Reader r{buf, len};
  if (len < 2 || buf[0] != 'P' || (buf[1] != '5' && buf[1] != '6')) return 1;
  const int c = buf[1] == '5' ? 1 : 3;
  r.pos = 2;
  long w, h, maxval;
  if (!pnm_token(r, &w) || !pnm_token(r, &h) || !pnm_token(r, &maxval))
    return 2;
  if (w <= 0 || h <= 0 || (uint64_t)w * h > kGipMaxDecodePixels) return 8;
  if (maxval < 1 || maxval > 65535) return 2;
  uint8_t ws;
  if (!r.u8(&ws) || !isspace(ws)) return 2;  // single whitespace after maxval

  const size_t n = (size_t)w * h * c;
  std::vector<uint8_t> img(n);
  if (maxval < 256) {
    if (!r.ok(n)) return 5;
    std::memcpy(img.data(), r.p + r.pos, n);
  } else {
    if (!r.ok(n * 2)) return 5;
    for (size_t i = 0; i < n; ++i) img[i] = r.p[r.pos + i * 2];  // BE high byte
  }
  return finish(img, (int)h, (int)w, c, out_buf, out_h, out_w, out_c);
}

// ---------------------------------------------------------------------------
// TGA from memory: truecolor (type 2), grayscale (type 3), colormapped
// (type 1), and their RLE variants (10/11/9); 8-bpp gray, 15/16-bpp
// A1R5G5B5, 24/32-bpp BGR(A); palettes of 15/16/24/32 bpp with 8-bit
// indices; both row orders + right-to-left mirroring.  This supersets the
// CLI's original file reader (gip_codec.cpp delegates here) and matches
// stb's TGA surface (stb_image.h:122 ".tga"; its colormap path).
// ---------------------------------------------------------------------------

int tga_decode_impl(const uint8_t* buf, size_t len, uint8_t** out_buf,
                    int* out_h, int* out_w, int* out_c) {
  if (len < 18) return 2;
  const int id_len = buf[0], cmap_type = buf[1], type = buf[2];
  const int cmap_origin = buf[3] | (buf[4] << 8);
  const int cmap_len = buf[5] | (buf[6] << 8);
  const int cmap_bpp = buf[7];
  const int w = buf[12] | (buf[13] << 8);
  const int h = buf[14] | (buf[15] << 8);
  const int bpp = buf[16];
  const uint8_t desc = buf[17];
  const bool top_down = (desc & 0x20) != 0;
  const bool right_to_left = (desc & 0x10) != 0;
  const bool rle = type == 9 || type == 10 || type == 11;
  const int base = type & 7;  // 1 colormapped, 2 truecolor, 3 gray

  if ((desc & 0xC0) != 0) return 3;  // interleave bits: unsupported
  if (base != 1 && base != 2 && base != 3) return 3;
  if (cmap_type > 1 || ((base == 1) != (cmap_type == 1))) return 3;
  // cmap_origin is the index of the FIRST palette entry (indices live in
  // [origin, origin+len)); out-of-range indices clamp to entry 0 in put().
  if (base == 1 && (bpp != 8 || cmap_len <= 0 || cmap_len > 256 ||
                    (cmap_bpp != 15 && cmap_bpp != 16 && cmap_bpp != 24 &&
                     cmap_bpp != 32)))
    return 3;
  if (base == 2 && bpp != 16 && bpp != 15 && bpp != 24 && bpp != 32) return 3;
  if (base == 3 && bpp != 8) return 3;
  if (w <= 0 || h <= 0 || (uint64_t)w * h > kGipMaxDecodePixels) return 8;

  Reader r{buf, len};
  r.pos = 18;
  if (!r.skip((size_t)id_len)) return 2;

  // Palette: stored entries convert to RGB(A) up front; indices offset by
  // cmap_origin per the spec.
  uint8_t pal[256][4];
  int pal_c = 3;
  if (base == 1) {
    const size_t entry_bytes = (cmap_bpp + 7) / 8;
    if (!r.ok((size_t)cmap_len * entry_bytes)) return 2;
    pal_c = cmap_bpp == 32 ? 4 : 3;
    for (int i = 0; i < cmap_len; ++i) {
      const uint8_t* e = r.p + r.pos + (size_t)i * entry_bytes;
      if (cmap_bpp >= 24) {
        pal[i][0] = e[2];
        pal[i][1] = e[1];
        pal[i][2] = e[0];
        pal[i][3] = cmap_bpp == 32 ? e[3] : 255;
      } else {  // 15/16: A1R5G5B5 little-endian
        uint32_t v = e[0] | (uint32_t(e[1]) << 8);
        pal[i][0] = scale_field(v, 0x7C00);
        pal[i][1] = scale_field(v, 0x03E0);
        pal[i][2] = scale_field(v, 0x001F);
        pal[i][3] = 255;
      }
    }
    r.pos += (size_t)cmap_len * entry_bytes;
  }

  const int src_bytes = base == 1 ? 1 : (bpp + 7) / 8;
  const int c = base == 3 ? 1
              : base == 1 ? pal_c
              : bpp == 32 ? 4
                          : 3;
  const size_t npx = (size_t)w * h;
  std::vector<uint8_t> img(npx * c);

  // Convert one source pixel into img at pixel index i (stored order).
  auto put = [&](size_t i, const uint8_t* s) {
    uint8_t* d = img.data() + i * c;
    if (base == 3) {
      d[0] = s[0];
    } else if (base == 1) {
      int k = s[0] - cmap_origin;
      if (k < 0 || k >= cmap_len) k = 0;
      for (int j = 0; j < c; ++j) d[j] = pal[k][j];
    } else if (src_bytes == 2) {
      uint32_t v = s[0] | (uint32_t(s[1]) << 8);
      d[0] = scale_field(v, 0x7C00);
      d[1] = scale_field(v, 0x03E0);
      d[2] = scale_field(v, 0x001F);
    } else {
      d[0] = s[2];
      d[1] = s[1];
      d[2] = s[0];
      if (c == 4) d[3] = s[3];
    }
  };

  if (rle) {
    size_t i = 0;
    while (i < npx) {
      uint8_t hdr;
      if (!r.u8(&hdr)) return 5;
      size_t count = (size_t)(hdr & 0x7F) + 1;
      if (count > npx - i) return 5;
      if (hdr & 0x80) {  // run packet: one pixel repeated
        if (!r.ok((size_t)src_bytes)) return 5;
        const uint8_t* s = r.p + r.pos;
        r.pos += src_bytes;
        for (size_t k = 0; k < count; ++k) put(i++, s);
      } else {  // raw packet
        if (!r.ok(count * src_bytes)) return 5;
        for (size_t k = 0; k < count; ++k)
          put(i++, r.p + r.pos + k * src_bytes);
        r.pos += count * src_bytes;
      }
    }
  } else {
    if (!r.ok(npx * src_bytes)) return 5;
    for (size_t i = 0; i < npx; ++i) put(i, r.p + r.pos + i * src_bytes);
  }

  if (!top_down) {
    const size_t row = (size_t)w * c;
    std::vector<uint8_t> tmp(row);
    for (int y = 0; y < h / 2; ++y) {
      uint8_t* a = img.data() + (size_t)y * row;
      uint8_t* b = img.data() + (size_t)(h - 1 - y) * row;
      std::memcpy(tmp.data(), a, row);
      std::memcpy(a, b, row);
      std::memcpy(b, tmp.data(), row);
    }
  }
  if (right_to_left) {
    for (int y = 0; y < h; ++y) {
      uint8_t* r0 = img.data() + (size_t)y * w * c;
      for (int x = 0; x < w / 2; ++x)
        for (int k = 0; k < c; ++k)
          std::swap(r0[(size_t)x * c + k], r0[(size_t)(w - 1 - x) * c + k]);
    }
  }
  return finish(img, h, w, c, out_buf, out_h, out_w, out_c);
}

// ---------------------------------------------------------------------------
// Radiance HDR writer (the fifth stb_image_write format: stb writes
// PNG/JPG/BMP/TGA/HDR, stb_image_write.h:140-170).  Takes the pipeline's
// LDR uint8, inverts the decoder's tone map (linear = (v/255)^2.2), and
// emits new-style RLE scanlines when the width allows (8..32767), flat
// RGBE otherwise — the exact streams hdr_decode_impl above reads back.
// ---------------------------------------------------------------------------

void rgbe_encode(float r, float g, float b, uint8_t* q) {
  float m = r > g ? r : g;
  if (b > m) m = b;
  if (m < 1e-32f) {
    q[0] = q[1] = q[2] = q[3] = 0;
    return;
  }
  int e;
  float f = std::frexp(m, &e);        // m = f * 2^e, f in [0.5, 1)
  float scale = f * 256.0f / m;       // = 256 / 2^e
  // Truncate, don't round: the max channel's mantissa is f*256 which can
  // reach 255.999; +0.5 rounding overflows it to 256 -> wraps to 0 (Ward's
  // code and stb_image_write truncate for the same reason).
  q[0] = (uint8_t)(r * scale);
  q[1] = (uint8_t)(g * scale);
  q[2] = (uint8_t)(b * scale);
  q[3] = (uint8_t)(e + 128);
}

// One RLE plane: runs >= 3 as (128+len, v) packets, literals capped at 128.
bool hdr_rle_plane(FILE* f, const uint8_t* p, int w) {
  int x = 0;
  while (x < w) {
    int run = 1;
    while (x + run < w && run < 127 && p[x + run] == p[x]) ++run;
    if (run >= 3) {
      uint8_t hd[2] = {(uint8_t)(128 + run), p[x]};
      if (std::fwrite(hd, 1, 2, f) != 2) return false;
      x += run;
    } else {
      int start = x;
      x += run;
      while (x < w && x - start < 128) {
        int r2 = 1;
        while (x + r2 < w && r2 < 3 && p[x + r2] == p[x]) ++r2;
        if (r2 >= 3) break;
        x += r2;
      }
      if (x - start > 128) x = start + 128;
      uint8_t n = (uint8_t)(x - start);
      if (std::fwrite(&n, 1, 1, f) != 1) return false;
      if (std::fwrite(p + start, 1, n, f) != n) return false;
    }
  }
  return true;
}

int hdr_write_impl(const char* path, const uint8_t* img, int h, int w, int c) {
  if (c != 1 && c != 3 && c != 4) return 1;
  if (w <= 0 || h <= 0) return 1;
  FILE* f = std::fopen(path, "wb");
  if (!f) return 2;
  std::fprintf(f, "#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y %d +X %d\n", h, w);

  const bool use_rle = w >= 8 && w < 32768;
  std::vector<uint8_t> scan((size_t)w * 4);
  // u8 -> linear lookup (inverse of rgbe_to_u8's gamma-2.2 tone map).
  float lut[256];
  for (int i = 0; i < 256; ++i) lut[i] = std::pow(i / 255.0f, 2.2f);

  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img + (size_t)y * w * c;
    for (int x = 0; x < w; ++x) {
      const uint8_t* p = row + (size_t)x * c;
      float r = lut[p[0]];
      float g = lut[c >= 3 ? p[1] : p[0]];
      float b = lut[c >= 3 ? p[2] : p[0]];
      rgbe_encode(r, g, b, &scan[(size_t)x * 4]);
    }
    if (use_rle) {
      uint8_t hd[4] = {2, 2, (uint8_t)(w >> 8), (uint8_t)(w & 0xFF)};
      if (std::fwrite(hd, 1, 4, f) != 4) goto fail;
      // Planes are written component-major: gather each into a row buffer.
      for (int k = 0; k < 4; ++k) {
        std::vector<uint8_t> plane((size_t)w);
        for (int x = 0; x < w; ++x) plane[x] = scan[(size_t)x * 4 + k];
        if (!hdr_rle_plane(f, plane.data(), w)) goto fail;
      }
    } else {
      if (std::fwrite(scan.data(), 1, scan.size(), f) != scan.size())
        goto fail;
    }
  }
  std::fclose(f);
  return 0;
fail:
  std::fclose(f);
  return 3;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI (exception-safe: never unwind into the ctypes caller).
// ---------------------------------------------------------------------------

extern "C" {

int gip_gif_decode(const uint8_t* buf, size_t len, uint8_t** out_buf,
                   int* out_h, int* out_w, int* out_c) {
  try {
    return gif_decode_impl(buf, len, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

// Multi-frame analog of stbi_load_gif_from_memory (stb_image.h:433): all
// frames stacked (frames, H, W, 4) + per-frame delays in ms.  The caller
// frees BOTH buffers with gip_free.  max_frames <= 0 means "all".
int gip_gif_frames_decode(const uint8_t* buf, size_t len, int max_frames,
                          uint8_t** out_buf, int** out_delays,
                          int* out_frames, int* out_h, int* out_w,
                          int* out_c) {
  try {
    return gif_frames_impl(buf, len, max_frames, out_buf, out_delays,
                           out_frames, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

int gip_bmp_decode(const uint8_t* buf, size_t len, uint8_t** out_buf,
                   int* out_h, int* out_w, int* out_c) {
  try {
    return bmp_decode_impl(buf, len, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

int gip_psd_decode(const uint8_t* buf, size_t len, uint8_t** out_buf,
                   int* out_h, int* out_w, int* out_c) {
  try {
    return psd_decode_impl(buf, len, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

int gip_hdr_decode(const uint8_t* buf, size_t len, uint8_t** out_buf,
                   int* out_h, int* out_w, int* out_c) {
  try {
    return hdr_decode_impl(buf, len, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

// stbi_loadf_from_memory analog (stb_image.h:458-463) for Radiance HDR:
// linear float RGB (m * 2^(e-136) per channel, no tone map).  Free with
// gip_free.
int gip_hdr_decodef(const uint8_t* buf, size_t len, float** out_buf,
                    int* out_h, int* out_w, int* out_c) {
  try {
    return hdr_decode_core(buf, len, nullptr, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

// stbi_load_16_from_memory analog (stb_image.h:445-449) for PSD: HWC
// uint16 (host-endian), depth-16 planes native, 8-bit planes upscaled
// v*257.  Free with gip_free.
int gip_psd_decode16(const uint8_t* buf, size_t len, uint16_t** out_buf,
                     int* out_h, int* out_w, int* out_c) {
  try {
    return psd_decode_core(buf, len, nullptr, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

int gip_pic_decode(const uint8_t* buf, size_t len, uint8_t** out_buf,
                   int* out_h, int* out_w, int* out_c) {
  try {
    return pic_decode_impl(buf, len, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

int gip_pnm_decode(const uint8_t* buf, size_t len, uint8_t** out_buf,
                   int* out_h, int* out_w, int* out_c) {
  try {
    return pnm_decode_impl(buf, len, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

int gip_tga_decode(const uint8_t* buf, size_t len, uint8_t** out_buf,
                   int* out_h, int* out_w, int* out_c) {
  try {
    return tga_decode_impl(buf, len, out_buf, out_h, out_w, out_c);
  } catch (...) {
    return 9;
  }
}

int gip_hdr_write(const char* path, const uint8_t* img, int h, int w, int c) {
  try {
    return hdr_write_impl(path, img, h, w, c);
  } catch (...) {
    return 9;
  }
}

}  // extern "C"
