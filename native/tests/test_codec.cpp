// Native codec test program (analog of the reference's C++ test binaries,
// tests/*.cu -- synthetic-image generation + roundtrip + printed verdict).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void gip_free(void*);
size_t gip_base64_encoded_size(size_t);
size_t gip_base64_encode(const uint8_t*, size_t, char*);
long long gip_base64_decode(const char*, size_t, uint8_t*);
int gip_png_encode(const uint8_t*, int, int, int, int, uint8_t**, size_t*);
int gip_png_decode(const uint8_t*, size_t, uint8_t**, int*, int*, int*);
int gip_ppm_write(const char*, const uint8_t*, int, int, int);
int gip_ppm_read(const char*, uint8_t**, int*, int*, int*);
int gip_bmp_write(const char*, const uint8_t*, int, int, int);
}

static int failures = 0;
#define CHECK(cond, msg)                                   \
  do {                                                     \
    if (!(cond)) {                                         \
      std::printf("[FAIL] %s\n", msg);                     \
      ++failures;                                          \
    } else {                                               \
      std::printf("[PASS] %s\n", msg);                     \
    }                                                      \
  } while (0)

// Synthetic test card: white square on gradient (like the reference's
// test_gaussian_blur.cu:22-36 synthetic input).
static std::vector<uint8_t> make_image(int h, int w, int c) {
  std::vector<uint8_t> img((size_t)h * w * c);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      for (int k = 0; k < c; ++k) {
        uint8_t v = (uint8_t)((x * 7 + y * 13 + k * 29) & 0xFF);
        if (y > h / 4 && y < 3 * h / 4 && x > w / 4 && x < 3 * w / 4) v = 255;
        img[((size_t)y * w + x) * c + k] = v;
      }
  return img;
}

int main() {
  // base64 roundtrip
  {
    const char* msg = "TPU image processing native codec";
    size_t n = std::strlen(msg);
    std::vector<char> enc(gip_base64_encoded_size(n) + 1);
    size_t elen = gip_base64_encode((const uint8_t*)msg, n, enc.data());
    std::vector<uint8_t> dec(n + 3);
    long long dlen = gip_base64_decode(enc.data(), elen, dec.data());
    CHECK(dlen == (long long)n && !std::memcmp(dec.data(), msg, n),
          "base64 roundtrip");
  }

  // PNG roundtrip for 1/3/4 channels
  for (int c : {1, 3, 4}) {
    auto img = make_image(37, 53, c);
    uint8_t* png = nullptr;
    size_t plen = 0;
    int rc = gip_png_encode(img.data(), 37, 53, c, 6, &png, &plen);
    char msg[64];
    std::snprintf(msg, sizeof msg, "png encode c=%d", c);
    CHECK(rc == 0 && plen > 8, msg);
    uint8_t* out = nullptr;
    int h = 0, w = 0, oc = 0;
    rc = gip_png_decode(png, plen, &out, &h, &w, &oc);
    std::snprintf(msg, sizeof msg, "png decode c=%d", c);
    CHECK(rc == 0 && h == 37 && w == 53 && oc == c &&
              !std::memcmp(out, img.data(), img.size()),
          msg);
    gip_free(png);
    gip_free(out);
  }

  // PPM roundtrip
  {
    auto img = make_image(24, 31, 3);
    CHECK(gip_ppm_write("/tmp/gip_test.ppm", img.data(), 24, 31, 3) == 0,
          "ppm write");
    uint8_t* out = nullptr;
    int h = 0, w = 0, c = 0;
    int rc = gip_ppm_read("/tmp/gip_test.ppm", &out, &h, &w, &c);
    CHECK(rc == 0 && h == 24 && w == 31 && c == 3 &&
              !std::memcmp(out, img.data(), img.size()),
          "ppm roundtrip");
    gip_free(out);
  }

  // BMP write (smoke: file exists and starts with 'BM')
  {
    auto img = make_image(16, 20, 3);
    CHECK(gip_bmp_write("/tmp/gip_test.bmp", img.data(), 16, 20, 3) == 0,
          "bmp write");
    FILE* f = std::fopen("/tmp/gip_test.bmp", "rb");
    char hdr[2] = {0, 0};
    if (f) {
      std::fread(hdr, 1, 2, f);
      std::fclose(f);
    }
    CHECK(hdr[0] == 'B' && hdr[1] == 'M', "bmp header");
  }

  std::printf("\n%s (%d failures)\n", failures ? "FAILED" : "ALL PASSED",
              failures);
  return failures ? 1 : 0;
}
