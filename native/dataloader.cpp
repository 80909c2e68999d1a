// demo2_tpu native data-loader core.
//
// The reference's input pipeline is PIL + torchvision transforms driven by
// Python worker processes (reference: data/datasets/make_dataloader.py,
// bases.py).  On a TPU VM the host CPU is the input bottleneck; this core
// moves the per-image hot path — JPEG decode, resize, flip, pad+crop,
// normalize, random erasing — into C++ with a std::thread pool, exposed via
// a plain C ABI consumed through ctypes (no pybind11 in the image).
//
// Randomness contract: Python decides the augmentation PARAMETERS (flip
// flag, crop offsets, erase rectangle) so the schedule stays reproducible
// from (seed, epoch); C++ only executes pixel work.  Erase noise is drawn
// from a std::mt19937 seeded per-image (documented: a different stream than
// the numpy fallback path).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC ... -ljpeg).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (RGB, 8-bit)
// ---------------------------------------------------------------------------

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

bool decode_jpeg_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->rgb.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// Resize: separable convolution with a per-axis scaled kernel (the kernel is
// widened by the scale factor when minifying — the antialiasing PIL applies).
// Two filters:
//   INTERP_CUBIC    — cubic a = -0.5, support 2 (train-time augmentation;
//                     close to PIL's antialiased bicubic).
//   INTERP_BILINEAR — triangle, support 1: torchvision's Resize default
//                     (PIL BILINEAR with antialias), used by the reference's
//                     EVAL transform (make_dataloader.py:198-202).  PIL runs
//                     the same separable triangle convolution in uint8
//                     fixed point, so outputs match within ~2/255/pass.
// ---------------------------------------------------------------------------

enum Interp { INTERP_CUBIC = 0, INTERP_BILINEAR = 1 };

inline float cubic(float x) {
  constexpr float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

inline float triangle(float x) {
  x = std::fabs(x);
  return x < 1.0f ? 1.0f - x : 0.0f;
}

// Resize one channel-interleaved RGB image to (oh, ow) with per-axis scaled
// cubic kernels (kernel widened by the scale factor when minifying — this is
// the antialiasing PIL applies).
struct KernelTable {
  std::vector<int> start;      // first source index per output position
  std::vector<float> weights;  // (n_out, ksize) normalized weights
  int ksize = 0;
};

KernelTable make_table(int n_in, int n_out, int interp) {
  const float support = interp == INTERP_BILINEAR ? 1.0f : 2.0f;
  float (*filter)(float) = interp == INTERP_BILINEAR ? triangle : cubic;
  const float s = float(n_in) / n_out;
  const float f = std::max(s, 1.0f);
  const int r = int(std::ceil(support * f));
  KernelTable t;
  t.ksize = 2 * r + 1;
  t.start.resize(n_out);
  t.weights.assign(size_t(n_out) * t.ksize, 0.0f);
  for (int o = 0; o < n_out; ++o) {
    const float center = (o + 0.5f) * s - 0.5f;
    const int x0 = int(std::floor(center)) - r;
    t.start[o] = x0;
    float norm = 0.0f;
    float* w = t.weights.data() + size_t(o) * t.ksize;
    for (int k = 0; k < t.ksize; ++k) {
      const int x = x0 + k;
      if (x < 0 || x >= n_in) continue;
      const float wv = filter((x - center) / f);
      w[k] = wv;
      norm += wv;
    }
    if (norm != 0.0f)
      for (int k = 0; k < t.ksize; ++k) w[k] /= norm;
  }
  return t;
}

// Cache-friendly separable resize: both passes iterate rows in the outer
// loop; inner loops are contiguous and auto-vectorizable.
void resize_sep(const Image& src, int oh, int ow, int interp,
                std::vector<float>* out) {
  const int ih = src.h, iw = src.w;
  const KernelTable tx = make_table(iw, ow, interp);
  const KernelTable ty = make_table(ih, oh, interp);

  // Horizontal pass: (ih, iw, 3) u8 -> (ih, ow, 3) f32, row-major walk.
  std::vector<float> tmp(size_t(ih) * ow * 3);
  for (int y = 0; y < ih; ++y) {
    const uint8_t* srow = src.rgb.data() + size_t(y) * iw * 3;
    float* drow = tmp.data() + size_t(y) * ow * 3;
    for (int ox = 0; ox < ow; ++ox) {
      const int x0 = tx.start[ox];
      const float* w = tx.weights.data() + size_t(ox) * tx.ksize;
      float a0 = 0, a1 = 0, a2 = 0;
      const int kmin = std::max(0, -x0);
      const int kmax = std::min(tx.ksize, iw - x0);
      const uint8_t* px = srow + size_t(x0 + kmin) * 3;
      for (int k = kmin; k < kmax; ++k, px += 3) {
        const float wv = w[k];
        a0 += wv * px[0];
        a1 += wv * px[1];
        a2 += wv * px[2];
      }
      drow[ox * 3 + 0] = a0;
      drow[ox * 3 + 1] = a1;
      drow[ox * 3 + 2] = a2;
    }
  }
  // Vertical pass: accumulate whole rows (contiguous, vectorizes).
  out->assign(size_t(oh) * ow * 3, 0.0f);
  const int rowlen = ow * 3;
  for (int oy = 0; oy < oh; ++oy) {
    float* drow = out->data() + size_t(oy) * rowlen;
    const int y0 = ty.start[oy];
    const float* w = ty.weights.data() + size_t(oy) * ty.ksize;
    const int kmin = std::max(0, -y0);
    const int kmax = std::min(ty.ksize, ih - y0);
    for (int k = kmin; k < kmax; ++k) {
      const float wv = w[k];
      if (wv == 0.0f) continue;
      const float* srow = tmp.data() + size_t(y0 + k) * rowlen;
      for (int i = 0; i < rowlen; ++i) drow[i] += wv * srow[i];
    }
  }
}

// ---------------------------------------------------------------------------
// Per-image transform parameters (decided by Python for determinism).
// ---------------------------------------------------------------------------

struct TransformParams {
  int32_t flip;          // 1 = horizontal flip
  int32_t pad;           // reflection-free zero padding size
  int32_t crop_top;      // crop offset inside padded image
  int32_t crop_left;
  int32_t erase;         // 1 = apply random erasing
  int32_t erase_top, erase_left, erase_h, erase_w;
  uint64_t noise_seed;   // erase noise stream
  int32_t crop_x0, crop_y0, crop_x1, crop_y1;  // pre-crop in source (wide strips); x1==0 -> none
  int32_t interp;        // Interp enum; 0 = cubic (train), 1 = bilinear (eval)
};

// Full pipeline for one image region -> normalized float32 HWC output.
bool process_one(const char* path, const TransformParams& p, int out_h,
                 int out_w, const float* mean, const float* std, float* out) {
  Image img;
  if (!decode_jpeg_file(path, &img)) return false;
  Image region;
  if (p.crop_x1 > 0) {  // wide-strip modality crop (RGBNT100 layout)
    const int cw = p.crop_x1 - p.crop_x0, ch = p.crop_y1 - p.crop_y0;
    region.h = ch;
    region.w = cw;
    region.rgb.resize(size_t(ch) * cw * 3);
    for (int y = 0; y < ch; ++y) {
      std::memcpy(region.rgb.data() + size_t(y) * cw * 3,
                  img.rgb.data() + (size_t(y + p.crop_y0) * img.w + p.crop_x0) * 3,
                  size_t(cw) * 3);
    }
  } else {
    region = std::move(img);
  }

  std::vector<float> resized;
  resize_sep(region, out_h, out_w, p.interp, &resized);

  if (p.flip) {
    for (int y = 0; y < out_h; ++y) {
      float* row = resized.data() + size_t(y) * out_w * 3;
      for (int x = 0; x < out_w / 2; ++x) {
        for (int c = 0; c < 3; ++c) std::swap(row[x * 3 + c], row[(out_w - 1 - x) * 3 + c]);
      }
    }
  }

  // Pad + crop fused: output pixel (y, x) reads padded (y + crop_top,
  // x + crop_left) which maps to resized (y + crop_top - pad, ...).
  const int pad = p.pad;
  for (int y = 0; y < out_h; ++y) {
    const int sy_ = y + p.crop_top - pad;
    for (int x = 0; x < out_w; ++x) {
      const int sx_ = x + p.crop_left - pad;
      float* dst = out + (size_t(y) * out_w + x) * 3;
      if (sy_ < 0 || sy_ >= out_h || sx_ < 0 || sx_ >= out_w) {
        for (int c = 0; c < 3; ++c) dst[c] = (0.0f - mean[c]) / std[c];
      } else {
        const float* src = resized.data() + (size_t(sy_) * out_w + sx_) * 3;
        for (int c = 0; c < 3; ++c)
          dst[c] = (src[c] / 255.0f - mean[c]) / std[c];
      }
    }
  }

  if (p.erase) {
    std::mt19937 gen(p.noise_seed);
    std::normal_distribution<float> nd(0.0f, 1.0f);
    for (int y = p.erase_top; y < std::min(out_h, p.erase_top + p.erase_h); ++y) {
      for (int x = p.erase_left; x < std::min(out_w, p.erase_left + p.erase_w); ++x) {
        float* dst = out + (size_t(y) * out_w + x) * 3;
        for (int c = 0; c < 3; ++c) dst[c] = nd(gen);
      }
    }
  }
  return true;
}

// ---------------------------------------------------------------------------
// Thread pool over batch items.
// ---------------------------------------------------------------------------

void parallel_for(int n, int num_threads, const std::function<void(int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> threads;
  const int nt = std::min(num_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Process a batch of images.  paths: n_items C strings; params: n_items
// TransformParams; out: (n_items, out_h, out_w, 3) float32.  Returns the
// number of failures (0 = success).
int d2t_load_batch(const char** paths, const TransformParams* params,
                   int n_items, int out_h, int out_w, const float* mean,
                   const float* std, int num_threads, float* out) {
  std::atomic<int> failures(0);
  parallel_for(n_items, num_threads, [&](int i) {
    float* dst = out + size_t(i) * out_h * out_w * 3;
    if (!process_one(paths[i], params[i], out_h, out_w, mean, std, dst)) {
      failures.fetch_add(1);
      std::memset(dst, 0, size_t(out_h) * out_w * 3 * sizeof(float));
    }
  });
  return failures.load();
}

// Decode a single JPEG into caller-provided buffer (h*w*3 uint8); returns
// actual dims via out params.  For probing / tests.
int d2t_decode_jpeg(const char* path, uint8_t* out, int max_bytes, int* h,
                    int* w) {
  Image img;
  if (!decode_jpeg_file(path, &img)) return -1;
  *h = img.h;
  *w = img.w;
  const int need = img.h * img.w * 3;
  if (need > max_bytes) return -2;
  std::memcpy(out, img.rgb.data(), need);
  return 0;
}

int d2t_version() { return 2; }  // 2: TransformParams.interp (bilinear eval)

}  // extern "C"
