// fastload: native JPEG decode + aspect resize + letterbox for the input
// pipeline — one pass, no intermediate numpy copies, GIL-free via ctypes.
//
// Replaces (optionally) the cv2.imread + cv2.resize + letterbox-pad chain of
// the host data loader (reference utils/datasets.py:659-677 load_image and
// utils/augmentations.py:92-122 letterbox). Python threads call into this
// through ctypes, which releases the GIL around the call, so a small thread
// pool decodes at full core count while TPU steps run.
//
// Conventions mirror the reference pipeline exactly:
//   * output pixels are BGR uint8 (cv2.imread order; the dataset converts
//     BGR->RGB at the very end of __getitem__)
//   * resize ratio r = img_size / max(h0, w0); area-average when r < 1 (the
//     reference's INTER_AREA eval path), bilinear otherwise, with cv2's
//     half-pixel center convention
//   * letterbox pads to the target with value 114 centred (auto=False path)
//
// Build: native/build.sh (g++ -O3 -fPIC -shared, links -ljpeg).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG byte buffer to BGR uint8. Returns false on decode error.
bool decode_jpeg_bgr(const uint8_t* buf, unsigned long len,
                     std::vector<uint8_t>& out, int& w, int& h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_EXT_BGR;  // libjpeg-turbo extension: direct BGR
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  const int stride = w * 3;
  out.resize(static_cast<size_t>(stride) * h);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize with cv2's half-pixel centers, BGR uint8. Per-column
// sample positions/weights are precomputed once; rows do pure FMA work.
void resize_bilinear(const uint8_t* src, int sw, int sh,
                     uint8_t* dst, int dw, int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    wxs[x] = fx - x0;
    x1s[x] = std::min(x0 + 1, sw - 1) * 3;
    x0s[x] = std::max(x0, 0) * 3;
  }
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    const float wy = fy - y0;
    const int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p00 = r0 + x0s[x];
      const uint8_t* p01 = r0 + x1s[x];
      const uint8_t* p10 = r1 + x0s[x];
      const uint8_t* p11 = r1 + x1s[x];
      const float wx = wxs[x];
      uint8_t* d = drow + x * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + wx * (p01[c] - p00[c]);
        float bot = p10[c] + wx * (p11[c] - p10[c]);
        float v = top + wy * (bot - top);
        d[c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Area-average resize (cv2 INTER_AREA semantics for downscale). Separable:
// horizontal pass with precomputed fractional spans into a float row
// buffer, then vertical accumulation — O(sw*sh) instead of O(dw*dh*k^2).
void resize_area(const uint8_t* src, int sw, int sh,
                 uint8_t* dst, int dw, int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  // x spans: flattened (index, weight) lists per output column
  std::vector<int> xi;       // source column * 3
  std::vector<float> xw;     // coverage / sx (normalised)
  std::vector<int> xoff(dw + 1, 0);
  for (int x = 0; x < dw; ++x) {
    const float fx0 = x * sx, fx1 = (x + 1) * sx;
    const int ix0 = static_cast<int>(std::floor(fx0));
    const int ix1 = std::min(static_cast<int>(std::ceil(fx1)), sw);
    for (int xx = ix0; xx < ix1; ++xx) {
      float cov = std::min(fx1, xx + 1.0f) - std::max(fx0, static_cast<float>(xx));
      xi.push_back(xx * 3);
      xw.push_back(cov);
    }
    xoff[x + 1] = static_cast<int>(xi.size());
  }
  std::vector<float> hrow(static_cast<size_t>(dw) * 3);   // one source row, x-reduced
  std::vector<float> acc(static_cast<size_t>(dw) * 3);    // y accumulator
  std::vector<float> area(dw);
  int cur_out = 0;
  std::fill(acc.begin(), acc.end(), 0.0f);
  std::fill(area.begin(), area.end(), 0.0f);
  for (int yy = 0; yy < sh && cur_out < dh; ++yy) {
    const uint8_t* row = src + static_cast<size_t>(yy) * sw * 3;
    for (int x = 0; x < dw; ++x) {
      float a0 = 0, a1 = 0, a2 = 0;
      for (int k = xoff[x]; k < xoff[x + 1]; ++k) {
        const uint8_t* p = row + xi[k];
        const float w = xw[k];
        a0 += p[0] * w;
        a1 += p[1] * w;
        a2 += p[2] * w;
      }
      hrow[x * 3 + 0] = a0;
      hrow[x * 3 + 1] = a1;
      hrow[x * 3 + 2] = a2;
    }
    // distribute this source row into the output rows it covers
    float remaining = 1.0f;
    while (remaining > 0 && cur_out < dh) {
      const float fy1 = (cur_out + 1) * sy;
      float cy = std::min(fy1, yy + 1.0f) - std::max(static_cast<float>(cur_out) * sy,
                                                     static_cast<float>(yy));
      cy = std::max(cy, 0.0f);
      if (cy > 0) {
        for (int x = 0; x < dw; ++x) {
          acc[x * 3 + 0] += hrow[x * 3 + 0] * cy;
          acc[x * 3 + 1] += hrow[x * 3 + 1] * cy;
          acc[x * 3 + 2] += hrow[x * 3 + 2] * cy;
        }
        // per-x area = x-coverage-sum * y-coverage; x-sum is constant per x
        for (int x = 0; x < dw; ++x) {
          float xs = 0;
          for (int k = xoff[x]; k < xoff[x + 1]; ++k) xs += xw[k];
          area[x] += xs * cy;
        }
      }
      if (fy1 <= yy + 1.0f + 1e-6f) {  // output row completes within this source row
        uint8_t* drow = dst + static_cast<size_t>(cur_out) * dw * 3;
        for (int x = 0; x < dw; ++x) {
          for (int c = 0; c < 3; ++c)
            drow[x * 3 + c] = static_cast<uint8_t>(acc[x * 3 + c] / area[x] + 0.5f);
        }
        std::fill(acc.begin(), acc.end(), 0.0f);
        std::fill(area.begin(), area.end(), 0.0f);
        ++cur_out;
        remaining = (yy + 1.0f) - fy1;
      } else {
        remaining = 0;
      }
    }
  }
  // flush a possibly-incomplete last row (fp edge)
  if (cur_out < dh) {
    uint8_t* drow = dst + static_cast<size_t>(cur_out) * dw * 3;
    for (int x = 0; x < dw; ++x)
      for (int c = 0; c < 3; ++c)
        drow[x * 3 + c] = static_cast<uint8_t>(
            area[x] > 0 ? acc[x * 3 + c] / area[x] + 0.5f : 114);
  }
}

}  // namespace

extern "C" {

// Decode + aspect resize to img_size on the long side (reference load_image,
// datasets.py:659-677). out must hold img_size*img_size*3 bytes.
// dims out: [h0, w0, h, w] (original and resized). Returns 0 on success.
int fl_load(const uint8_t* buf, unsigned long len, int img_size, int augment,
            uint8_t* out, int* dims) {
  std::vector<uint8_t> full;
  int w0 = 0, h0 = 0;
  if (!decode_jpeg_bgr(buf, len, full, w0, h0)) return 1;
  const double r = static_cast<double>(img_size) / std::max(h0, w0);
  int w = w0, h = h0;
  if (r != 1.0) {
    w = static_cast<int>(w0 * r);
    h = static_cast<int>(h0 * r);
    if (r < 1.0 && !augment)
      resize_area(full.data(), w0, h0, out, w, h);
    else
      resize_bilinear(full.data(), w0, h0, out, w, h);
  } else {
    std::memcpy(out, full.data(), full.size());
  }
  dims[0] = h0; dims[1] = w0; dims[2] = h; dims[3] = w;
  return 0;
}

// Fused decode + aspect resize + centred letterbox pad to (tgt_h, tgt_w)
// with value 114 (reference letterbox auto=False, augmentations.py:92-122).
// scaleup=0 clamps r<=1 (eval path). out must hold tgt_h*tgt_w*3 bytes.
// meta out: [ratio, pad_w, pad_h, h0, w0] (floats). Returns 0 on success.
int fl_load_letterbox(const uint8_t* buf, unsigned long len, int tgt_h,
                      int tgt_w, int scaleup, uint8_t* out, float* meta) {
  std::vector<uint8_t> full;
  int w0 = 0, h0 = 0;
  if (!decode_jpeg_bgr(buf, len, full, w0, h0)) return 1;
  double r = std::min(static_cast<double>(tgt_h) / h0,
                      static_cast<double>(tgt_w) / w0);
  if (!scaleup) r = std::min(r, 1.0);
  const int w = static_cast<int>(std::lround(w0 * r));
  const int h = static_cast<int>(std::lround(h0 * r));
  const double dw = (tgt_w - w) / 2.0, dh = (tgt_h - h) / 2.0;
  // reference: round(d - 0.1) each side
  const int top = static_cast<int>(std::lround(dh - 0.1));
  const int left = static_cast<int>(std::lround(dw - 0.1));

  std::memset(out, 114, static_cast<size_t>(tgt_h) * tgt_w * 3);
  std::vector<uint8_t> resized;
  const uint8_t* src = full.data();
  if (w != w0 || h != h0) {
    resized.resize(static_cast<size_t>(w) * h * 3);
    if (r < 1.0)
      resize_area(full.data(), w0, h0, resized.data(), w, h);
    else
      resize_bilinear(full.data(), w0, h0, resized.data(), w, h);
    src = resized.data();
  }
  for (int y = 0; y < h; ++y) {
    std::memcpy(out + ((static_cast<size_t>(top + y)) * tgt_w + left) * 3,
                src + static_cast<size_t>(y) * w * 3,
                static_cast<size_t>(w) * 3);
  }
  meta[0] = static_cast<float>(r);
  meta[1] = static_cast<float>(left);
  meta[2] = static_cast<float>(top);
  meta[3] = static_cast<float>(h0);
  meta[4] = static_cast<float>(w0);
  return 0;
}

// Probe dimensions without a full decode. Returns 0 on success.
int fl_probe(const uint8_t* buf, unsigned long len, int* dims) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  dims[0] = cinfo.image_height;
  dims[1] = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
