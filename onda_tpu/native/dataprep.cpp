// Native host-side data-prep runtime for the input pipeline.
//
// The framework's host path (PNG decode → bicubic/nearest resize → BGR flip +
// normalize → label LUT remap) is the only non-XLA compute in the system; the
// reference leans on torch DataLoader worker processes + PIL for it (reference
// framework/dataset/segmentation_db.py:82-99). This module reimplements that
// path in C++ (libpng + fixed-point separable resampling + std::thread
// parallelism) behind a C ABI consumed via ctypes — no Python in the pixel loop.
//
// The resampler mirrors Pillow's algorithm (separable convolution with
// scale-widened support and PRECISION_BITS=22 fixed-point coefficients, per-pass
// u8 rounding) so outputs are byte-exact with the PIL path used for parity.
//
// Build: g++ -O3 -march=native -shared -fPIC dataprep.cpp -o libdataprep.so -lpng -lpthread

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow's PRECISION_BITS

struct Filter {
    double support;
    double (*fn)(double);
};

double bicubic_filter(double x) {  // Pillow bicubic, a = -0.5
    constexpr double a = -0.5;
    x = std::fabs(x);
    if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
    if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
    return 0.0;
}

double bilinear_filter(double x) {
    x = std::fabs(x);
    return x < 1.0 ? 1.0 - x : 0.0;
}

// Pillow-style coefficient table for one output axis.
void precompute_coeffs(int in_size, int out_size, const Filter& filter,
                       std::vector<int>& bounds, std::vector<int>& kk, int& ksize) {
    double scale = static_cast<double>(in_size) / out_size;
    double filterscale = std::max(scale, 1.0);
    double support = filter.support * filterscale;
    ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    bounds.resize(out_size * 2);
    kk.resize(out_size * ksize);
    std::vector<double> w(ksize);
    for (int xx = 0; xx < out_size; ++xx) {
        double center = (xx + 0.5) * scale;
        double ww = 0.0;
        double ss = 1.0 / filterscale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        int x = 0;
        for (; x < xmax; ++x) {
            double v = filter.fn((x + xmin - center + 0.5) * ss);
            w[x] = v;
            ww += v;
        }
        for (x = 0; x < xmax; ++x)
            if (ww != 0.0) w[x] /= ww;
        for (; x < ksize; ++x) w[x] = 0.0;
        for (x = 0; x < ksize; ++x)
            kk[xx * ksize + x] =
                static_cast<int>(std::round(w[x] * (1 << kPrecisionBits)));
        bounds[xx * 2 + 0] = xmin;
        bounds[xx * 2 + 1] = xmax;
    }
}

inline uint8_t clip8(int64_t v) {
    v >>= kPrecisionBits;
    if (v < 0) return 0;
    if (v > 255) return 255;
    return static_cast<uint8_t>(v);
}

void parallel_rows(int rows, int threads, const std::function<void(int, int)>& body) {
    threads = std::max(1, std::min(threads, rows));
    if (threads == 1) {
        body(0, rows);
        return;
    }
    std::vector<std::thread> pool;
    int chunk = (rows + threads - 1) / threads;
    for (int t = 0; t < threads; ++t) {
        int lo = t * chunk, hi = std::min(rows, lo + chunk);
        if (lo >= hi) break;
        pool.emplace_back(body, lo, hi);
    }
    for (auto& th : pool) th.join();
}

// separable two-pass resample, per-pass u8 rounding (Pillow semantics)
void resample_u8(const uint8_t* src, int h, int w, int ch, uint8_t* dst, int oh,
                 int ow, const Filter& filter, int threads) {
    std::vector<int> bounds_h, kk_h, bounds_v, kk_v;
    int ksize_h, ksize_v;
    precompute_coeffs(w, ow, filter, bounds_h, kk_h, ksize_h);
    precompute_coeffs(h, oh, filter, bounds_v, kk_v, ksize_v);

    std::vector<uint8_t> tmp(static_cast<size_t>(h) * ow * ch);
    const int64_t half = 1LL << (kPrecisionBits - 1);
    // horizontal pass
    parallel_rows(h, threads, [&](int lo, int hi) {
        for (int y = lo; y < hi; ++y) {
            const uint8_t* srow = src + static_cast<size_t>(y) * w * ch;
            uint8_t* trow = tmp.data() + static_cast<size_t>(y) * ow * ch;
            for (int xx = 0; xx < ow; ++xx) {
                int xmin = bounds_h[xx * 2], xmax = bounds_h[xx * 2 + 1];
                const int* k = &kk_h[xx * ksize_h];
                for (int c = 0; c < ch; ++c) {
                    int64_t ss = half;
                    for (int x = 0; x < xmax; ++x)
                        ss += static_cast<int64_t>(srow[(xmin + x) * ch + c]) * k[x];
                    trow[xx * ch + c] = clip8(ss);
                }
            }
        }
    });
    // vertical pass
    parallel_rows(oh, threads, [&](int lo, int hi) {
        for (int yy = lo; yy < hi; ++yy) {
            int ymin = bounds_v[yy * 2], ymax = bounds_v[yy * 2 + 1];
            const int* k = &kk_v[yy * ksize_v];
            uint8_t* drow = dst + static_cast<size_t>(yy) * ow * ch;
            for (int xx = 0; xx < ow * ch; ++xx) {
                int64_t ss = half;
                for (int y = 0; y < ymax; ++y)
                    ss += static_cast<int64_t>(
                              tmp[static_cast<size_t>(ymin + y) * ow * ch + xx]) *
                          k[y];
                drow[xx] = clip8(ss);
            }
        }
    });
}

}  // namespace

extern "C" {

// PNG decode to RGB8 (force_rgb) or native gray8. Returns 0 on success; fills
// out dims. Caller allocates `out` with out_capacity bytes (use probe first).
int png_probe(const char* path, int* height, int* width, int* channels,
              int force_rgb) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return -2;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    *height = png_get_image_height(png, info);
    *width = png_get_image_width(png, info);
    int color = png_get_color_type(png, info);
    *channels = force_rgb ? 3 : (color == PNG_COLOR_TYPE_GRAY ? 1 : 3);
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
}

int png_decode(const char* path, uint8_t* out, int force_rgb) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return -2;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    int h = png_get_image_height(png, info);
    int w = png_get_image_width(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    int has_trns = png_get_valid(png, info, PNG_INFO_tRNS);
    if (has_trns) png_set_tRNS_to_alpha(png);
    if (force_rgb && (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA))
        png_set_gray_to_rgb(png);
    // drop alpha — including alpha ADDED by the tRNS expansion above, which a
    // gate on the original color type alone would miss (the extra channel
    // would then overflow the caller's rgb/gray-sized buffer)
    if ((color & PNG_COLOR_MASK_ALPHA) || has_trns) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    int rowbytes = png_get_rowbytes(png, info);
    // the caller allocated h*w*channels from png_probe; never write past it
    int expect = force_rgb ? 3 : (color == PNG_COLOR_TYPE_GRAY ? 1 : 3);
    if (rowbytes != w * expect) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return -3;
    }
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * rowbytes;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    (void)w;
    return 0;
}

void resize_bicubic_u8(const uint8_t* src, int h, int w, int ch, uint8_t* dst,
                       int oh, int ow, int threads) {
    resample_u8(src, h, w, ch, dst, oh, ow, Filter{2.0, bicubic_filter}, threads);
}

void resize_bilinear_u8(const uint8_t* src, int h, int w, int ch, uint8_t* dst,
                        int oh, int ow, int threads) {
    resample_u8(src, h, w, ch, dst, oh, ow, Filter{1.0, bilinear_filter}, threads);
}

// PIL NEAREST: src index = floor((dst + 0.5) * scale)
void resize_nearest_u8(const uint8_t* src, int h, int w, int ch, uint8_t* dst,
                       int oh, int ow) {
    double sy = static_cast<double>(h) / oh, sx = static_cast<double>(w) / ow;
    for (int y = 0; y < oh; ++y) {
        int yin = std::min(static_cast<int>((y + 0.5) * sy), h - 1);
        const uint8_t* srow = src + static_cast<size_t>(yin) * w * ch;
        uint8_t* drow = dst + static_cast<size_t>(y) * ow * ch;
        for (int x = 0; x < ow; ++x) {
            int xin = std::min(static_cast<int>((x + 0.5) * sx), w - 1);
            std::memcpy(drow + x * ch, srow + xin * ch, ch);
        }
    }
}

// RGB u8 HWC → BGR f32 HWC with x/255 then (x - mean/255) / (std/255)
// (reference segmentation_db.py:97-99 + base_transform)
void normalize_bgr_f32(const uint8_t* src, int h, int w, float* dst,
                       const float* mean, const float* stddev, int threads) {
    float m[3], inv[3];
    for (int c = 0; c < 3; ++c) {
        m[c] = mean[c] / 255.0f;
        inv[c] = 255.0f / stddev[c];
    }
    parallel_rows(h, threads, [&](int lo, int hi) {
        for (int y = lo; y < hi; ++y) {
            const uint8_t* srow = src + static_cast<size_t>(y) * w * 3;
            float* drow = dst + static_cast<size_t>(y) * w * 3;
            for (int x = 0; x < w; ++x) {
                for (int c = 0; c < 3; ++c) {
                    float v = srow[x * 3 + (2 - c)] * (1.0f / 255.0f);  // BGR flip
                    drow[x * 3 + c] = (v - m[c]) * inv[c];
                }
            }
        }
    });
}

// int32 LUT remap (label2train): dst[i] = lut[src[i]]. Returns nonzero when a
// label id falls outside the table — the Python path raises IndexError on the
// same input (LabelMapper), and silently training such a pixel as class 0
// would corrupt labels only on the native fast path.
int lut_remap_u8_i32(const uint8_t* src, int n, const int32_t* lut, int lut_size,
                     int32_t* dst) {
    int oob = 0;
    for (int i = 0; i < n; ++i) {
        int v = src[i];
        if (v >= lut_size) { oob = 1; v = 0; }
        dst[i] = lut[v];
    }
    return oob;
}

// one-shot sample prep: decode → resize bicubic → BGR normalize (image path)
int prepare_image(const char* path, int out_h, int out_w, const float* mean,
                  const float* stddev, float* dst, int threads) {
    int h, w, ch;
    if (png_probe(path, &h, &w, &ch, 1) != 0) return -1;
    std::vector<uint8_t> raw(static_cast<size_t>(h) * w * 3);
    if (png_decode(path, raw.data(), 1) != 0) return -2;
    std::vector<uint8_t> resized(static_cast<size_t>(out_h) * out_w * 3);
    resize_bicubic_u8(raw.data(), h, w, 3, resized.data(), out_h, out_w, threads);
    normalize_bgr_f32(resized.data(), out_h, out_w, dst, mean, stddev, threads);
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Pipelined batch executor: a persistent worker pool that prepares whole
// batches asynchronously. Python submits a batch job (per-image tasks fan out
// across the pool), keeps loading ahead, and blocks in job_wait (GIL released
// by ctypes) only when the batch is actually needed. This replaces Python
// thread scheduling + per-image ctypes calls in the hot input path — the
// TPU-native stand-in for the reference's 7 DataLoader worker processes
// (reference train_ouda.py:129-135).
// ---------------------------------------------------------------------------

namespace {

struct Job {
    std::atomic<int> remaining{0};
    std::atomic<int> status{0};  // first nonzero task status wins
};

class Executor {
  public:
    explicit Executor(int workers) {
        for (int i = 0; i < std::max(1, workers); ++i)
            pool_.emplace_back([this] { this->run(); });
    }

    ~Executor() {
        {
            std::lock_guard<std::mutex> g(mu_);
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& t : pool_) t.join();
    }

    int submit(std::vector<std::function<int()>> tasks) {
        std::lock_guard<std::mutex> g(mu_);
        int id = next_id_++;
        Job* job = new Job;
        job->remaining.store(static_cast<int>(tasks.size()));
        jobs_[id] = job;
        if (tasks.empty()) {
            done_cv_.notify_all();
            return id;
        }
        for (auto& t : tasks) queue_.emplace_back(job, std::move(t));
        cv_.notify_all();
        return id;
    }

    // blocks until the job completes; reaps it and returns its status
    int wait(int id) {
        std::unique_lock<std::mutex> g(mu_);
        auto it = jobs_.find(id);
        if (it == jobs_.end()) return -100;
        Job* job = it->second;
        done_cv_.wait(g, [job] { return job->remaining.load() == 0; });
        int status = job->status.load();
        jobs_.erase(id);
        delete job;
        return status;
    }

  private:
    void run() {
        for (;;) {
            std::pair<Job*, std::function<int()>> item;
            {
                std::unique_lock<std::mutex> g(mu_);
                cv_.wait(g, [this] { return stop_ || !queue_.empty(); });
                if (stop_) return;
                item = std::move(queue_.front());
                queue_.pop_front();
            }
            int rc = item.second();
            if (rc != 0) {
                int expected = 0;
                item.first->status.compare_exchange_strong(expected, rc);
            }
            if (item.first->remaining.fetch_sub(1) == 1) {
                std::lock_guard<std::mutex> g(mu_);
                done_cv_.notify_all();
            }
        }
    }

    std::mutex mu_;
    std::condition_variable cv_;
    std::condition_variable done_cv_;
    std::deque<std::pair<Job*, std::function<int()>>> queue_;
    std::unordered_map<int, Job*> jobs_;
    std::vector<std::thread> pool_;
    int next_id_ = 1;
    bool stop_ = false;
};

Executor* g_executor = nullptr;
std::mutex g_executor_mu;

}  // namespace

extern "C" {
int prepare_image(const char* path, int out_h, int out_w, const float* mean,
                  const float* stddev, float* dst, int threads);
int prepare_label(const char* path, int out_h, int out_w, int res_h, int res_w,
                  const int32_t* lut, int lut_size, int32_t* dst_full,
                  int32_t* dst_res);
}

extern "C" {

// start (or resize — only on first call) the global pool; idempotent
int executor_start(int workers) {
    std::lock_guard<std::mutex> g(g_executor_mu);
    if (g_executor == nullptr) g_executor = new Executor(workers);
    return 0;
}

// submit a whole image batch: paths[i] → dst + i*out_h*out_w*3
int executor_submit_images(const char** paths, int n, int out_h, int out_w,
                           const float* mean, const float* stddev, float* dst) {
    if (g_executor == nullptr) return -101;
    std::vector<std::function<int()>> tasks;
    tasks.reserve(n);
    // copy everything the tasks touch: the Python caller may free its
    // argument temporaries as soon as this returns (dst must stay alive)
    std::vector<float> m(mean, mean + 3), s(stddev, stddev + 3);
    for (int i = 0; i < n; ++i) {
        std::string path(paths[i]);
        float* out = dst + static_cast<size_t>(i) * out_h * out_w * 3;
        tasks.push_back([path, out_h, out_w, m, s, out]() {
            return prepare_image(path.c_str(), out_h, out_w, m.data(), s.data(), out, 1);
        });
    }
    return g_executor->submit(std::move(tasks));
}

// submit a whole label batch: paths[i] → dst_full/dst_res slices
int executor_submit_labels(const char** paths, int n, int out_h, int out_w,
                           int res_h, int res_w, const int32_t* lut, int lut_size,
                           int32_t* dst_full, int32_t* dst_res) {
    if (g_executor == nullptr) return -101;
    std::vector<std::function<int()>> tasks;
    tasks.reserve(n);
    std::vector<int32_t> lut_copy(lut, lut + lut_size);
    for (int i = 0; i < n; ++i) {
        std::string path(paths[i]);
        int32_t* full = dst_full + static_cast<size_t>(i) * out_h * out_w;
        int32_t* res = dst_res + static_cast<size_t>(i) * res_h * res_w;
        tasks.push_back([path, out_h, out_w, res_h, res_w, lut_copy, full, res]() {
            return prepare_label(path.c_str(), out_h, out_w, res_h, res_w,
                                 lut_copy.data(), (int)lut_copy.size(), full, res);
        });
    }
    return g_executor->submit(std::move(tasks));
}

int executor_wait(int job_id) {
    if (g_executor == nullptr) return -101;
    return g_executor->wait(job_id);
}

}  // extern "C"

extern "C" {

// one-shot label prep: decode gray → nearest resize (twice: full + 1/8 grid) → LUT
int prepare_label(const char* path, int out_h, int out_w, int res_h, int res_w,
                  const int32_t* lut, int lut_size, int32_t* dst_full,
                  int32_t* dst_res) {
    int h, w, ch;
    if (png_probe(path, &h, &w, &ch, 0) != 0) return -1;
    if (ch != 1) return -3;
    std::vector<uint8_t> raw(static_cast<size_t>(h) * w);
    if (png_decode(path, raw.data(), 0) != 0) return -2;
    std::vector<uint8_t> full(static_cast<size_t>(out_h) * out_w);
    resize_nearest_u8(raw.data(), h, w, 1, full.data(), out_h, out_w);
    std::vector<uint8_t> res(static_cast<size_t>(res_h) * res_w);
    resize_nearest_u8(raw.data(), h, w, 1, res.data(), res_h, res_w);
    if (lut_remap_u8_i32(full.data(), out_h * out_w, lut, lut_size, dst_full) |
        lut_remap_u8_i32(res.data(), res_h * res_w, lut, lut_size, dst_res))
        return -4;  // label id outside the remap table
    return 0;
}

}  // extern "C"
