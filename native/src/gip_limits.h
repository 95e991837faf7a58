// Decode-side resource caps shared by the PNG and JPEG decoders.
//
// A decoder's memory use must be bounded by what the HEADER declares, and a
// header fits in a few bytes -- so without a cap a ~100-byte upload can
// declare 2^30 x 2^30 pixels and drive a multi-gigabyte allocation (or an
// uncaught std::bad_alloc unwinding through the C ABI into ctypes, killing
// the serving process).  The cap matches PIL's decompression-bomb threshold
// (PIL.Image.MAX_IMAGE_PIXELS = 178956970) so the native tier is never more
// permissive than the PIL fallback it fronts (utils/image.py).
#pragma once
#include <cstdint>

inline constexpr uint64_t kGipMaxDecodePixels = 178956970ULL;
