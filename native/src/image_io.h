// Native image IO for the host data pipeline: grayscale JPEG decode and 16-bit
// PNG depth decode with bilinear/nearest resize. Replaces the role of the
// reference's torch DataLoader worker processes (SURVEY.md section 2.7, "host
// loader parallelism") with an in-process threaded C++ path bound via ctypes.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace emvm {

struct Image {
  int h = 0;
  int w = 0;
  std::vector<float> data;  // row-major, single channel
};

// Decode a JPEG to grayscale float in [0, 1] (ITU-R 601 luma for color files).
bool DecodeJpegGray(const std::string& path, Image* out);

// Decode a 16-bit grayscale PNG storing millimeters; output meters.
bool DecodeDepthPng16(const std::string& path, Image* out);

// Bilinear resize (images) and nearest resize (depth maps).
Image ResizeBilinear(const Image& src, int out_h, int out_w);
Image ResizeNearest(const Image& src, int out_h, int out_w);

}  // namespace emvm
