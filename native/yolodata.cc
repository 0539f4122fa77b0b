// yolodata: native host-side input pipeline for yolojax.
//
// TPU-native replacement for the reference's TFRecord-reader/queue-runner
// C++ threads (SURVEY.md §2 native-capability table): a persistent worker
// pool that reads + JPEG-decodes + bilinear-letterboxes a whole batch of
// images into a caller-provided float32 canvas tensor in one C call.
// Python (ctypes) releases the GIL for the duration, so decode parallelism
// is real, unlike Python-thread decoding.
//
// API (C, stable):
//   void* ydl_create(int num_threads);
//   void  ydl_destroy(void* pool);
//   int   ydl_load_batch(void* pool,
//                        const char** paths, int n,
//                        int dim, int stretch,
//                        float* out_images,      // n*dim*dim*3, [0,1] RGB
//                        float* out_transforms,  // n*4: sx, sy, px, py
//                        int* out_status);       // n: 0 ok, !=0 errno-ish
//     returns number of failed images (0 == all good).
//
// Build: make -C native   (g++ -O3 -shared -ljpeg -lpthread)

#include <cstddef>  // jpeglib.h uses size_t/FILE without including them
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (classic libjpeg API with longjmp error trap)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// Decode a JPEG file into an RGB u8 buffer. Returns false on any error.
bool decode_jpeg(const char* path, std::vector<uint8_t>* rgb, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // libjpeg converts gray/YCbCr for us
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  const int stride = *w * 3;
  rgb->resize(static_cast<size_t>(stride) * *h);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// Bilinear resize u8 RGB -> f32 canvas region (normalized [0,1])
// ---------------------------------------------------------------------------

void bilinear_into(const uint8_t* src, int sw, int sh, float* dst, int dim,
                   int nw, int nh, int px, int py) {
  // dst is a dim x dim x 3 canvas; write the nw x nh region at (px, py).
  // Half-pixel-center sampling (src = (dst+0.5)*scale - 0.5, clamped) to
  // match cv2.INTER_LINEAR / jax.image.resize("linear") — the Python
  // loader path must produce the same canvases as this pool.
  //
  // Separable two-pass with precomputed taps: a horizontal pass resamples
  // each needed source row once into (sh x nw), the vertical pass blends
  // row pairs. ~2x fewer multiplies than per-pixel 4-tap sampling and the
  // inner loops vectorize — the naive version was 5x slower than cv2.
  const float x_ratio = static_cast<float>(sw) / nw;
  const float y_ratio = static_cast<float>(sh) / nh;

  std::vector<int> xi0(nw), xi1(nw);
  std::vector<float> xw(nw);
  for (int x = 0; x < nw; ++x) {
    float fx = (x + 0.5f) * x_ratio - 0.5f;
    if (fx < 0) fx = 0;
    if (fx > sw - 1) fx = static_cast<float>(sw - 1);
    xi0[x] = static_cast<int>(fx);
    xi1[x] = xi0[x] + 1 < sw ? xi0[x] + 1 : xi0[x];
    xw[x] = fx - xi0[x];
  }

  // Horizontal pass, computed lazily per source row. Slot a always holds
  // row y0, slot b always row y1; when upscaling, the previous y1 becomes
  // the next y0 via a swap, so each source row is resampled exactly once.
  std::vector<float> hrow_a(static_cast<size_t>(nw) * 3);
  std::vector<float> hrow_b(static_cast<size_t>(nw) * 3);
  int cached_a = -1, cached_b = -1;

  auto hpass = [&](int sy, std::vector<float>& out) {
    const uint8_t* r = src + static_cast<size_t>(sy) * sw * 3;
    for (int x = 0; x < nw; ++x) {
      const float w1 = xw[x];
      const float w0 = 1.f - w1;
      const uint8_t* p0 = r + xi0[x] * 3;
      const uint8_t* p1 = r + xi1[x] * 3;
      float* o = out.data() + static_cast<size_t>(x) * 3;
      o[0] = p0[0] * w0 + p1[0] * w1;
      o[1] = p0[1] * w0 + p1[1] * w1;
      o[2] = p0[2] * w0 + p1[2] * w1;
    }
  };

  constexpr float kInv255 = 1.f / 255.f;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * y_ratio - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = static_cast<float>(sh - 1);
    const int y0 = static_cast<int>(fy);
    const int y1 = y0 + 1 < sh ? y0 + 1 : y0;
    const float wy1 = fy - y0;
    const float wy0 = 1.f - wy1;
    if (cached_a != y0) {
      if (cached_b == y0) {
        std::swap(hrow_a, hrow_b);
        std::swap(cached_a, cached_b);
      } else {
        hpass(y0, hrow_a);
        cached_a = y0;
      }
    }
    if (y1 != y0 && cached_b != y1) {
      hpass(y1, hrow_b);
      cached_b = y1;
    }
    const float* r0 = hrow_a.data();
    const float* r1 = (y1 == y0) ? r0 : hrow_b.data();
    float* out_row = dst + (static_cast<size_t>(py + y) * dim + px) * 3;
    const int n3 = nw * 3;
    for (int i = 0; i < n3; ++i) {
      out_row[i] = (r0[i] * wy0 + r1[i] * wy1) * kInv255;
    }
  }
}

void gray_fill(float* dst, int dim) {
  const size_t total = static_cast<size_t>(dim) * dim * 3;
  for (size_t i = 0; i < total; ++i) dst[i] = 0.5f;
}

// Fill only the letterbox padding (the resize overwrites the interior) —
// halves canvas memory traffic vs gray-filling everything first.
void gray_fill_bars(float* dst, int dim, int nw, int nh, int px, int py) {
  const int row3 = dim * 3;
  auto fill = [&](size_t start, size_t count) {
    for (size_t i = start; i < start + count; ++i) dst[i] = 0.5f;
  };
  fill(0, static_cast<size_t>(py) * row3);                      // top bar
  const size_t bot = static_cast<size_t>(py + nh) * row3;
  fill(bot, static_cast<size_t>(dim) * row3 - bot);             // bottom bar
  for (int y = py; y < py + nh; ++y) {                          // side bars
    float* row = dst + static_cast<size_t>(y) * row3;
    fill(static_cast<size_t>(row - dst), static_cast<size_t>(px) * 3);
    const int right = (px + nw) * 3;
    fill(static_cast<size_t>(row - dst) + right,
         static_cast<size_t>(row3 - right));
  }
}

// Decode+letterbox one image into its canvas slot. Returns 0 on success.
int load_one(const char* path, int dim, int stretch, float* canvas,
             float* transform) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  transform[0] = 1.f;
  transform[1] = 1.f;
  transform[2] = 0.f;
  transform[3] = 0.f;
  if (!decode_jpeg(path, &rgb, &w, &h) || w <= 0 || h <= 0) {
    gray_fill(canvas, dim);
    return 1;
  }
  if (stretch) {
    bilinear_into(rgb.data(), w, h, canvas, dim, dim, dim, 0, 0);
    return 0;
  }
  const float r = std::fmin(static_cast<float>(dim) / w,
                            static_cast<float>(dim) / h);
  int nw = static_cast<int>(std::lround(w * r));
  int nh = static_cast<int>(std::lround(h * r));
  if (nw < 1) nw = 1;
  if (nh < 1) nh = 1;
  if (nw > dim) nw = dim;
  if (nh > dim) nh = dim;
  const int px = (dim - nw) / 2;
  const int py = (dim - nh) / 2;
  gray_fill_bars(canvas, dim, nw, nh, px, py);
  bilinear_into(rgb.data(), w, h, canvas, dim, nw, nh, px, py);
  transform[0] = static_cast<float>(nw) / dim;
  transform[1] = static_cast<float>(nh) / dim;
  transform[2] = static_cast<float>(px) / dim;
  transform[3] = static_cast<float>(py) / dim;
  return 0;
}

// ---------------------------------------------------------------------------
// Persistent worker pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    if (n < 1) n = 1;
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] { this->run(); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

}  // namespace

extern "C" {

void* ydl_create(int num_threads) { return new Pool(num_threads); }

void ydl_destroy(void* pool) { delete static_cast<Pool*>(pool); }

int ydl_load_batch(void* pool_ptr, const char** paths, int n, int dim,
                   int stretch, float* out_images, float* out_transforms,
                   int* out_status) {
  Pool* pool = static_cast<Pool*>(pool_ptr);
  std::atomic<int> remaining(n);
  std::atomic<int> failures(0);
  std::mutex done_mu;
  std::condition_variable done_cv;
  const size_t img_elems = static_cast<size_t>(dim) * dim * 3;
  for (int i = 0; i < n; ++i) {
    pool->submit([=, &remaining, &failures, &done_mu, &done_cv] {
      const int rc = load_one(paths[i], dim, stretch,
                              out_images + img_elems * i,
                              out_transforms + 4 * i);
      out_status[i] = rc;
      if (rc) failures.fetch_add(1);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

// Single-image convenience (detect path).
int ydl_load_one(const char* path, int dim, int stretch, float* out_image,
                 float* out_transform) {
  return load_one(path, dim, stretch, out_image, out_transform);
}

}  // extern "C"
