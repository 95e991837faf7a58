// Mutational fuzzer for the native decoders (PNG, JPEG, base64).
//
// The decoders parse UNTRUSTED uploads on the serving path
// (server/app.py -> utils/image.py -> utils/native_codec.py), so memory
// safety here is a product requirement, not a nicety.  The reference gets
// this hardening for free from battle-tested stb/PIL; a from-scratch codec
// has to earn it.  This driver is deterministic: the same (seed, iterations)
// pair replays the same inputs, so a sanitizer report is reproducible by
// re-running with `--at <iter>` (which also dumps the offending input to
// /tmp/gip_fuzz_case.bin for standalone triage).
//
// Build (sanitized) via the `fuzz_codec` CMake target; run:
//   ./fuzz_codec [iterations=200000] [seed=1] [--at K]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "fuzz_seeds.h"

extern "C" {
void gip_free(void*);
long long gip_base64_decode(const char*, size_t, uint8_t*);
int gip_png_encode(const uint8_t*, int, int, int, int, uint8_t**, size_t*);
int gip_png_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_jpeg_encode(const uint8_t*, int, int, int, int, uint8_t**, size_t*);
int gip_jpeg_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_tga_write(const char*, const uint8_t*, int, int, int);
int gip_tga_read(const char*, uint8_t**, int*, int*, int*);
int gip_gif_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_gif_frames_decode(const uint8_t*, size_t, int, uint8_t**, int**,
                          int*, int*, int*, int*);
int gip_bmp_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_psd_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_hdr_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_pic_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_pnm_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_tga_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_hdr_write(const char*, const uint8_t*, int, int, int);
int gip_png_decode16(const uint8_t*, size_t, uint16_t**, int*, int*, int*);
int gip_psd_decode16(const uint8_t*, size_t, uint16_t**, int*, int*, int*);
int gip_hdr_decodef(const uint8_t*, size_t, float**, int*, int*, int*);
}

namespace {

uint64_t g_state = 0x9E3779B97F4A7C15ULL;
uint64_t rnd64() {  // xorshift64*
  uint64_t x = g_state;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  g_state = x;
  return x * 0x2545F4914F6CDD1DULL;
}
uint32_t rnd(uint32_t bound) { return bound ? (uint32_t)(rnd64() % bound) : 0; }

std::vector<uint8_t> synth_image(int h, int w, int c, uint32_t tweak) {
  std::vector<uint8_t> img((size_t)h * w * c);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      for (int k = 0; k < c; ++k)
        img[((size_t)y * w + x) * c + k] =
            (uint8_t)(x * 5 + y * 11 + k * 37 + tweak);
  return img;
}

std::vector<uint8_t> enc_png(int h, int w, int c, int level = 6) {
  auto img = synth_image(h, w, c, 3);
  uint8_t* buf = nullptr;
  size_t len = 0;
  if (gip_png_encode(img.data(), h, w, c, level, &buf, &len) != 0) return {};
  std::vector<uint8_t> out(buf, buf + len);
  gip_free(buf);
  return out;
}

std::vector<uint8_t> enc_jpeg(int h, int w, int c, int q) {
  auto img = synth_image(h, w, c, 7);
  uint8_t* buf = nullptr;
  size_t len = 0;
  if (gip_jpeg_encode(img.data(), h, w, c, q, &buf, &len) != 0) return {};
  std::vector<uint8_t> out(buf, buf + len);
  gip_free(buf);
  return out;
}

std::vector<uint8_t> enc_tga(int h, int w, int c) {
  auto img = synth_image(h, w, c, 11);
  const char* path = "/tmp/gip_fuzz_seed.tga";
  if (gip_tga_write(path, img.data(), h, w, c) != 0) return {};
  FILE* f = std::fopen(path, "rb");
  if (!f) return {};
  std::vector<uint8_t> out;
  uint8_t chunk[4096];
  size_t got;
  while ((got = std::fread(chunk, 1, sizeof chunk, f)) > 0)
    out.insert(out.end(), chunk, chunk + got);
  std::fclose(f);
  return out;
}

// One mutation of a corpus entry.  Mix of generic byte smashes and
// format-aware dirt (marker bytes, huge big-endian lengths).
void mutate(std::vector<uint8_t>& d) {
  if (d.empty()) return;
  switch (rnd(8)) {
    case 0: {  // bit flips
      int k = 1 + rnd(32);
      for (int i = 0; i < k; ++i) d[rnd((uint32_t)d.size())] ^= 1u << rnd(8);
      break;
    }
    case 1:  // random byte
      d[rnd((uint32_t)d.size())] = (uint8_t)rnd(256);
      break;
    case 2: {  // truncate
      size_t keep = 1 + rnd((uint32_t)d.size());
      d.resize(keep);
      break;
    }
    case 3: {  // insert random run
      size_t at = rnd((uint32_t)d.size());
      int k = 1 + rnd(16);
      std::vector<uint8_t> ins(k);
      for (auto& b : ins) b = (uint8_t)rnd(256);
      d.insert(d.begin() + at, ins.begin(), ins.end());
      break;
    }
    case 4: {  // delete span
      size_t at = rnd((uint32_t)d.size());
      size_t k = 1 + rnd(16);
      if (at + k > d.size()) k = d.size() - at;
      d.erase(d.begin() + at, d.begin() + at + k);
      break;
    }
    case 5: {  // duplicate span (chunk/segment duplication)
      size_t at = rnd((uint32_t)d.size());
      size_t k = 1 + rnd(24);
      if (at + k > d.size()) k = d.size() - at;
      std::vector<uint8_t> span(d.begin() + at, d.begin() + at + k);
      d.insert(d.begin() + rnd((uint32_t)d.size()), span.begin(), span.end());
      break;
    }
    case 6: {  // marker dirt: 0xFF + random marker byte
      size_t at = rnd((uint32_t)d.size());
      d[at] = 0xFF;
      if (at + 1 < d.size()) d[at + 1] = (uint8_t)rnd(256);
      break;
    }
    default: {  // big-endian magic value (huge length / dimension)
      if (d.size() < 4) break;
      size_t at = rnd((uint32_t)(d.size() - 3));
      static const uint32_t magics[] = {0xFFFFFFFFu, 0x7FFFFFFFu, 0x80000000u,
                                        0x0000FFFFu, 0x00010000u, 65535u, 1u, 0u};
      uint32_t m = magics[rnd(sizeof(magics) / sizeof(magics[0]))];
      d[at] = (uint8_t)(m >> 24);
      d[at + 1] = (uint8_t)(m >> 16);
      d[at + 2] = (uint8_t)(m >> 8);
      d[at + 3] = (uint8_t)m;
      break;
    }
  }
}

void run_decoders(const std::vector<uint8_t>& d) {
  uint8_t* out = nullptr;
  int h = 0, w = 0, c = 0;
  if (gip_png_decode(d.data(), d.size(), &out, &h, &w, &c) == 0) {
    if (h <= 0 || w <= 0 || (c != 1 && c != 2 && c != 3 && c != 4)) {
      std::fprintf(stderr, "png_decode returned bad dims %dx%dx%d\n", h, w, c);
      std::abort();
    }
    gip_free(out);
  }
  out = nullptr;
  if (gip_jpeg_decode(d.data(), d.size(), &out, &h, &w, &c) == 0) {
    if (h <= 0 || w <= 0 || (c != 1 && c != 3)) {
      std::fprintf(stderr, "jpeg_decode returned bad dims %dx%dx%d\n", h, w, c);
      std::abort();
    }
    gip_free(out);
  }
  // The gip_formats decoders: same memory-safety bar, dims sanity-checked.
  struct FmtFn {
    const char* name;
    int (*fn)(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
    int cmin, cmax;
  };
  static const FmtFn kFmts[] = {
      {"gif_decode", gip_gif_decode, 3, 4},
      {"bmp_decode", gip_bmp_decode, 3, 4},
      {"psd_decode", gip_psd_decode, 1, 4},
      {"hdr_decode", gip_hdr_decode, 3, 3},
      {"pic_decode", gip_pic_decode, 3, 4},
      {"pnm_decode", gip_pnm_decode, 1, 3},
      {"tga_decode", gip_tga_decode, 1, 4},
  };
  for (const auto& fmt : kFmts) {
    out = nullptr;
    if (fmt.fn(d.data(), d.size(), &out, &h, &w, &c) == 0) {
      if (h <= 0 || w <= 0 || c < fmt.cmin || c > fmt.cmax) {
        std::fprintf(stderr, "%s returned bad dims %dx%dx%d\n", fmt.name, h, w,
                     c);
        std::abort();
      }
      gip_free(out);
    }
  }
  // Multi-frame GIF: distinct code path (disposal compositing, delay
  // array, two-back restore) — fuzz it alongside the still decoder.
  // Cap at 16 frames so a mutated frame-count bomb stays fast.
  out = nullptr;
  int* delays = nullptr;
  int nframes = 0;
  if (gip_gif_frames_decode(d.data(), d.size(), 16, &out, &delays, &nframes,
                            &h, &w, &c) == 0) {
    if (nframes <= 0 || nframes > 16 || h <= 0 || w <= 0 || c != 4) {
      std::fprintf(stderr, "gif_frames returned bad dims %d x %dx%dx%d\n",
                   nframes, h, w, c);
      std::abort();
    }
    for (int i = 0; i < nframes; ++i) {
      if (delays[i] < 0) {
        std::fprintf(stderr, "gif_frames negative delay\n");
        std::abort();
      }
    }
    gip_free(out);
    gip_free(delays);
  }
  // Wide-output decoders (stbi_load_16 / stbi_loadf analogs): same
  // hostile streams, different output element widths -- the 16-bit PNG
  // sample assembly and the float RGBE conversion are distinct code
  // paths from their u8 siblings.
  {
    uint16_t* out16 = nullptr;
    if (gip_png_decode16(d.data(), d.size(), &out16, &h, &w, &c) == 0) {
      if (h <= 0 || w <= 0 || c < 1 || c > 4) {
        std::fprintf(stderr, "png_decode16 bad dims %dx%dx%d\n", h, w, c);
        std::abort();
      }
      gip_free(out16);
    }
    out16 = nullptr;
    if (gip_psd_decode16(d.data(), d.size(), &out16, &h, &w, &c) == 0) {
      if (h <= 0 || w <= 0 || c < 1 || c > 4) {
        std::fprintf(stderr, "psd_decode16 bad dims %dx%dx%d\n", h, w, c);
        std::abort();
      }
      gip_free(out16);
    }
    float* outf = nullptr;
    if (gip_hdr_decodef(d.data(), d.size(), &outf, &h, &w, &c) == 0) {
      if (h <= 0 || w <= 0 || c != 3) {
        std::fprintf(stderr, "hdr_decodef bad dims %dx%dx%d\n", h, w, c);
        std::abort();
      }
      gip_free(outf);
    }
  }
  // base64: caller contract is an output buffer sized (n/4 + 1) * 3
  // (utils/native_codec.py::b64_decode) -- fuzz against exactly that.
  std::vector<uint8_t> b64out((d.size() / 4 + 1) * 3);
  gip_base64_decode((const char*)d.data(), d.size(), b64out.data());
  // TGA reads from a path (the CLI's untrusted-file surface): round the
  // mutated bytes through a temp file.
  FILE* f = std::fopen("/tmp/gip_fuzz_in.tga", "wb");
  if (f) {
    std::fwrite(d.data(), 1, d.size(), f);
    std::fclose(f);
    out = nullptr;
    if (gip_tga_read("/tmp/gip_fuzz_in.tga", &out, &h, &w, &c) == 0) {
      if (h <= 0 || w <= 0 || (c != 1 && c != 3 && c != 4)) {
        std::fprintf(stderr, "tga_read returned bad dims %dx%dx%d\n", h, w, c);
        std::abort();
      }
      gip_free(out);
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  long iterations = 200000;
  uint64_t seed = 1;
  long only_at = -1;
  // Strip --at <K> first so it is never consumed as a positional (else
  // `fuzz_codec 200000 --at K` would replay under seed 0, defeating the
  // deterministic-replay guarantee).
  std::vector<const char*> pos;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--at") && i + 1 < argc) {
      only_at = std::atol(argv[++i]);
    } else {
      pos.push_back(argv[i]);
    }
  }
  if (pos.size() > 0) iterations = std::atol(pos[0]);
  if (pos.size() > 1) seed = (uint64_t)std::strtoull(pos[1], nullptr, 10);
  if (only_at >= iterations) iterations = only_at + 1;

  // Seed corpus: real outputs of our own encoders (several geometries /
  // channel counts / subsampling-free qualities) plus raw header stubs.
  std::vector<std::vector<uint8_t>> corpus;
  for (int c : {1, 3, 4}) corpus.push_back(enc_png(29, 37, c));
  for (int c : {1, 3, 4}) corpus.push_back(enc_png(23, 31, c, 1));  // Sub+RLE
  corpus.push_back(enc_png(1, 1, 1));
  corpus.push_back(enc_png(8, 128, 3));
  for (int q : {30, 90}) {
    corpus.push_back(enc_jpeg(24, 31, 1, q));
    corpus.push_back(enc_jpeg(17, 40, 3, q));
  }
  corpus.push_back(enc_jpeg(8, 8, 3, 95));
  corpus.push_back({0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A});
  corpus.push_back({0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x43, 0x00});
  for (int c : {1, 3, 4}) corpus.push_back(enc_tga(21, 27, c));
  // RLE bottom-up TGA (the variant our writer never emits).
  corpus.push_back({0, 0, 10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 2, 0, 24, 0,
                    0x81, 0, 0, 255, 0x01, 0, 255, 0, 255, 0, 0});
  // Colormapped TGA (type 1, 8-bit indices, 24-bit palette, 2 entries).
  corpus.push_back({0, 1, 1, 0, 0, 2, 0, 24, 0, 0, 0, 0, 2, 0, 2, 0, 8, 0x20,
                    10, 20, 30, 200, 100, 50, 0, 1, 1, 0});
  // 16-bpp truecolor TGA (A1R5G5B5).
  corpus.push_back({0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 1, 0, 16, 0x20,
                    0x1F, 0x7C, 0xE0, 0x03});
  // Binary PNM seeds: P6 RGB 2x2 maxval 255 (with a comment), P5 gray
  // 16-bit (maxval 65535, big-endian), and a bare header stub.
  {
    const char* p6 = "P6\n# c\n2 2\n255\n";
    std::vector<uint8_t> s(p6, p6 + std::strlen(p6));
    for (int i = 0; i < 12; ++i) s.push_back((uint8_t)(i * 21));
    corpus.push_back(s);
    const char* p5 = "P5 3 2 65535 ";
    std::vector<uint8_t> t(p5, p5 + std::strlen(p5));
    for (int i = 0; i < 12; ++i) t.push_back((uint8_t)(i * 13 + 7));
    corpus.push_back(t);
    const char* stub = "P5\n#";
    corpus.push_back(std::vector<uint8_t>(stub, stub + std::strlen(stub)));
  }
  // Radiance HDR produced by our own RLE writer (exercises writer+reader).
  {
    auto img = synth_image(9, 33, 3, 5);
    if (gip_hdr_write("/tmp/gip_fuzz_seed.hdr", img.data(), 9, 33, 3) == 0) {
      FILE* f = std::fopen("/tmp/gip_fuzz_seed.hdr", "rb");
      if (f) {
        std::vector<uint8_t> out;
        uint8_t chunk[4096];
        size_t got;
        while ((got = std::fread(chunk, 1, sizeof chunk, f)) > 0)
          out.insert(out.end(), chunk, chunk + got);
        std::fclose(f);
        corpus.push_back(out);
      }
    }
  }
  // Format seeds for the gip_formats decoders (generated valid files
  // covering RLE / interlace / bitfields paths; see fuzz_seeds.h).
#define GIP_ADD_SEED(n) \
  corpus.push_back(std::vector<uint8_t>(kSeed_##n, kSeed_##n + sizeof kSeed_##n));
  GIP_FORMAT_SEEDS(GIP_ADD_SEED)
#undef GIP_ADD_SEED
  // A base64-looking text seed.
  {
    const char* t = "aGVsbG8gd29ybGQ=\nQUJDRA==";
    corpus.push_back(std::vector<uint8_t>(t, t + std::strlen(t)));
  }
  size_t live = 0;
  for (auto& s : corpus) live += !s.empty();
  std::printf("corpus: %zu seeds (%zu live)\n", corpus.size(), live);

  g_state = seed * 0x9E3779B97F4A7C15ULL + 0xBF58476D1CE4E5B9ULL;
  for (long it = 0; it < iterations; ++it) {
    std::vector<uint8_t> d = corpus[rnd((uint32_t)corpus.size())];
    int nmut = 1 + rnd(8);
    for (int m = 0; m < nmut; ++m) mutate(d);
    if (only_at >= 0) {
      if (it != only_at) continue;
      FILE* f = std::fopen("/tmp/gip_fuzz_case.bin", "wb");
      if (f) {
        std::fwrite(d.data(), 1, d.size(), f);
        std::fclose(f);
      }
      std::printf("iteration %ld: %zu bytes dumped to /tmp/gip_fuzz_case.bin\n",
                  it, d.size());
      run_decoders(d);
      std::printf("iteration %ld survived\n", it);
      return 0;
    }
    run_decoders(d);
    if ((it + 1) % 20000 == 0)
      std::printf("  %ld/%ld iterations\n", it + 1, iterations);
  }
  std::printf("fuzz OK: %ld iterations, seed %llu\n", iterations,
              (unsigned long long)seed);
  return 0;
}
