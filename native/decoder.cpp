// fsvlm_tpu native image decoder.
//
// The reference's input pipeline spends its host CPU in PIL/torchvision
// inside DataLoader worker *processes* (dassl data_manager.py:42-49).  The
// TPU-native replacement decodes JPEGs in C++ — libjpeg with DCT-domain
// downscaling (decode at 1/2, 1/4, 1/8 of full resolution when the target
// is small), bilinear resize of the shorter edge, center crop — producing
// the uint8 tensors the device-side fused augmentation consumes.  Python
// calls in via ctypes; the GIL is released for the duration of the call, so
// a plain thread pool achieves process-level parallelism without pickling.
//
// Build: make -C native   (produces libfsvlm_native.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Separable bilinear resize RGB u8 (h, w) -> (oh, ow): one horizontal pass
// into a float intermediate, then a vertical pass — precomputed taps, tight
// inner loops the compiler vectorizes.
void resize_bilinear(const uint8_t* src, int h, int w, uint8_t* dst, int oh,
                     int ow) {
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> wx(ow);
  const float sx = static_cast<float>(w) / ow;
  for (int x = 0; x < ow; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int i0 = std::max(0, std::min(w - 1, static_cast<int>(std::floor(fx))));
    x0[x] = i0;
    x1[x] = std::min(w - 1, i0 + 1);
    wx[x] = std::min(1.0f, std::max(0.0f, fx - i0));
  }

  // horizontal pass: (h, w, 3) -> (h, ow, 3) float
  std::vector<float> tmp(static_cast<size_t>(h) * ow * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const uint8_t* a = row + x0[x] * 3;
      const uint8_t* b = row + x1[x] * 3;
      const float t = wx[x];
      trow[x * 3 + 0] = a[0] + (b[0] - a[0]) * t;
      trow[x * 3 + 1] = a[1] + (b[1] - a[1]) * t;
      trow[x * 3 + 2] = a[2] + (b[2] - a[2]) * t;
    }
  }

  // vertical pass: (h, ow, 3) -> (oh, ow, 3) u8
  const float sy = static_cast<float>(h) / oh;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(h - 1, static_cast<int>(std::floor(fy))));
    int y1 = std::min(h - 1, y0 + 1);
    const float t = std::min(1.0f, std::max(0.0f, fy - y0));
    const float* a = tmp.data() + static_cast<size_t>(y0) * ow * 3;
    const float* b = tmp.data() + static_cast<size_t>(y1) * ow * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * ow * 3;
    for (int i = 0; i < ow * 3; ++i) {
      drow[i] = static_cast<uint8_t>(a[i] + (b[i] - a[i]) * t + 0.5f);
    }
  }
}

// JPEG decode into caller-owned buffers.  All libjpeg calls (and therefore
// every possible error_exit longjmp) happen inside THIS frame, which holds
// no automatic objects with destructors — `raw` and `row` live in the
// caller, so a longjmp cannot skip their cleanup (the previous layout
// allocated them between setjmp and jpeg_read_scanlines, leaking both
// heap blocks on every corrupt image: formally UB, practically a
// per-failed-decode leak retried each epoch by every loader thread).
int decode_jpeg(const uint8_t* data, long len, int pre_size,
                std::vector<uint8_t>& raw, std::vector<uint8_t>& row,
                int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain downscale: pick the largest 1/2^k that keeps the shorter
  // edge >= pre_size.
  int shorter = std::min(cinfo.image_width, cinfo.image_height);
  int denom = 1;
  while (denom < 8 && shorter / (denom * 2) >= pre_size) denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int comps = cinfo.output_components;
  raw.resize(static_cast<size_t>(w) * h * 3);
  row.resize(static_cast<size_t>(w) * comps);
  JSAMPROW rowptr = row.data();
  for (int y = 0; y < h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    uint8_t* dst = raw.data() + static_cast<size_t>(y) * w * 3;
    if (comps == 3) {
      std::memcpy(dst, row.data(), static_cast<size_t>(w) * 3);
    } else if (comps == 1) {
      for (int x = 0; x < w; ++x) {
        dst[x * 3] = dst[x * 3 + 1] = dst[x * 3 + 2] = row[x];
      }
    } else {
      jpeg_finish_decompress(&cinfo);
      jpeg_destroy_decompress(&cinfo);
      return 3;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_w = w;
  *out_h = h;
  return 0;
}

}  // namespace

extern "C" {

// Decode a JPEG buffer, resize shorter edge to pre_size, center-crop to
// (pre_size, pre_size, 3) u8 into `out`.  Returns 0 on success.
int fsvlm_decode_resize_crop(const uint8_t* data, long len, int pre_size,
                             uint8_t* out) {
  std::vector<uint8_t> raw, row;
  int w = 0, h = 0;
  const int rc = decode_jpeg(data, len, pre_size, raw, row, &w, &h);
  if (rc != 0) return rc;

  // resize shorter edge to pre_size
  int ow, oh;
  if (w <= h) {
    ow = pre_size;
    oh = std::max(pre_size, static_cast<int>(std::lround(
                                static_cast<double>(h) * pre_size / w)));
  } else {
    oh = pre_size;
    ow = std::max(pre_size, static_cast<int>(std::lround(
                                static_cast<double>(w) * pre_size / h)));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(ow) * oh * 3);
  resize_bilinear(raw.data(), h, w, resized.data(), oh, ow);

  // center crop
  const int left = (ow - pre_size) / 2;
  const int top = (oh - pre_size) / 2;
  for (int y = 0; y < pre_size; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * pre_size * 3,
                resized.data() + (static_cast<size_t>(y + top) * ow + left) * 3,
                static_cast<size_t>(pre_size) * 3);
  }
  return 0;
}

// File-path convenience wrapper (reads the whole file, then decodes).
int fsvlm_decode_file(const char* path, int pre_size, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 10;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(len));
  size_t got = std::fread(buf.data(), 1, static_cast<size_t>(len), f);
  std::fclose(f);
  if (got != static_cast<size_t>(len)) return 11;
  return fsvlm_decode_resize_crop(buf.data(), len, pre_size, out);
}

}  // extern "C"
