// Native data loader: threaded JPEG/PNG decode + bilinear resize.
//
// The reference's input pipeline runs inside tf.data's C++ runtime
// (ref BigGAN_128.py:~188-194 — map_and_batch(parallel=16) + prefetch);
// this is the equivalent native component for the TPU framework: a worker
// pool decodes and resizes images into ready uint8 batches behind a
// bounded queue, so the Python train loop only memcpy's and ships to the
// chip. Exposed as a C API consumed via ctypes
// (biggan_tpu/data/native_loader.py).
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cc -o libbtloader.so -ljpeg -lpng -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <deque>
#include <fstream>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // H*W*3
  int w = 0, h = 0;
};

// ---------------------------------------------------------------- decode

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

bool decode_jpeg(const uint8_t* data, size_t size, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const uint8_t* data, size_t size, Image* out) {
  png_image img;
  std::memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&img, data, size)) return false;
  img.format = PNG_FORMAT_RGB;
  out->w = img.width;
  out->h = img.height;
  out->rgb.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out->rgb.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

bool decode_file(const std::string& path, Image* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  if (buf.size() < 8) return false;
  if (buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf.data(), buf.size(), out);
  if (buf[0] == 0x89 && buf[1] == 'P') return decode_png(buf.data(), buf.size(), out);
  return false;
}

// ---------------------------------------------------------------- resize

// PIL-convention BILINEAR resampling: separable triangle filter with
// support scaled by the downscale factor (antialiased), half-pixel
// centers. Matches PIL.Image.resize(..., BILINEAR) to rounding — the
// Python fallback pipeline uses PIL, and the two paths must feed the
// trainer the same distribution (tests/test_native_loader.py).
struct FilterTaps {
  std::vector<int> first;      // per output index: first source index
  std::vector<int> count;      // taps per output index
  std::vector<float> weights;  // [out, max_count] row-major, normalized
  int max_count = 0;
};

FilterTaps triangle_taps(int in_size, int out_size) {
  FilterTaps t;
  const double scale = double(in_size) / out_size;
  const double fscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * fscale;  // bilinear filter support = 1
  t.max_count = int(support) * 2 + 2;
  t.first.resize(out_size);
  t.count.resize(out_size);
  t.weights.assign(size_t(out_size) * t.max_count, 0.f);
  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0;
    float* w = &t.weights[size_t(x) * t.max_count];
    for (int i = xmin; i < xmax; ++i) {
      double d = (i + 0.5 - center) / fscale;
      double v = d < 0 ? 1.0 + d : 1.0 - d;  // triangle
      if (v < 0) v = 0;
      w[i - xmin] = float(v);
      total += v;
    }
    if (total > 0)
      for (int i = 0; i < xmax - xmin; ++i) w[i] = float(w[i] / total);
    t.first[x] = xmin;
    t.count[x] = xmax - xmin;
  }
  return t;
}

void resize_bilinear(const Image& src, int size, uint8_t* dst) {
  if (src.w == size && src.h == size) {
    // identity resize — common when the dataset is pre-sized to
    // img_size; the triangle filter at scale 1 is numerically the
    // identity anyway (single tap, weight 1), so skip the two passes
    std::memcpy(dst, src.rgb.data(), size_t(size) * size * 3);
    return;
  }
  FilterTaps hx = triangle_taps(src.w, size);
  FilterTaps vy = triangle_taps(src.h, size);
  // horizontal pass: [src.h, size, 3] float
  std::vector<float> tmp(size_t(src.h) * size * 3);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* row = &src.rgb[size_t(y) * src.w * 3];
    float* orow = &tmp[size_t(y) * size * 3];
    for (int x = 0; x < size; ++x) {
      const float* w = &hx.weights[size_t(x) * hx.max_count];
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < hx.count[x]; ++k) {
        const uint8_t* p = row + size_t(hx.first[x] + k) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      orow[x * 3 + 0] = acc[0];
      orow[x * 3 + 1] = acc[1];
      orow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass
  for (int y = 0; y < size; ++y) {
    const float* w = &vy.weights[size_t(y) * vy.max_count];
    uint8_t* orow = dst + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < vy.count[y]; ++k) {
        const float* p = &tmp[(size_t(vy.first[y] + k) * size + x) * 3];
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      for (int c = 0; c < 3; ++c) {
        float v = acc[c] + 0.5f;
        orow[x * 3 + c] = uint8_t(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// ---------------------------------------------------------------- loader

struct Batch {
  std::vector<uint8_t> images;  // B*S*S*3
  std::vector<int32_t> labels;  // B
};

struct Loader {
  std::vector<std::string> files;
  std::vector<int32_t> labels;
  int img_size, batch;
  size_t queue_cap;
  int mode = 1;  // 0 = iid with replacement; 1 = shuffled epochs (ref-faithful)
  uint64_t base_seed = 0;
  std::atomic<bool> stop{false};
  std::deque<Batch> queue;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::vector<std::thread> threads;

  // Shuffled-epoch traversal: one shared cursor over a per-epoch
  // permutation — every file exactly once per epoch regardless of worker
  // interleaving (the counterpart of tf.data shuffle_and_repeat,
  // ref BigGAN_128.py:~188-194). Deterministic per (seed, epoch) so a
  // resumed run continues the same traversal.
  std::mutex idx_mu;
  std::vector<uint32_t> perm;
  size_t pos = 0;
  uint64_t epoch = 0;

  // Fisher–Yates driven by splitmix64 — bit-identical to the Python
  // fallback's shared_epoch_perm (data/pipeline.py), so a resume at the
  // same (seed, start_count) continues the exact same traversal whether
  // this .so loads on the resuming host or not.
  static uint64_t splitmix64(uint64_t& s) {
    uint64_t z = (s += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }

  void reshuffle_locked() {
    perm.resize(files.size());
    for (size_t i = 0; i < perm.size(); ++i) perm[i] = uint32_t(i);
    if (perm.size() < 2) return;
    uint64_t s = base_seed ^ (epoch * 0x9E3779B97F4A7C15ULL + 1);
    for (size_t i = perm.size() - 1; i >= 1; --i) {
      size_t j = size_t(splitmix64(s) % uint64_t(i + 1));
      std::swap(perm[i], perm[j]);
    }
  }

  void seek(uint64_t n_images) {
    std::lock_guard<std::mutex> lk(idx_mu);
    epoch = n_images / files.size();
    pos = n_images % files.size();
    reshuffle_locked();
  }

  size_t next_index(std::mt19937_64& rng) {
    if (mode == 0) return rng() % files.size();
    std::lock_guard<std::mutex> lk(idx_mu);
    if (perm.empty()) reshuffle_locked();
    if (pos >= perm.size()) {
      ++epoch;
      pos = 0;
      reshuffle_locked();
    }
    return perm[pos++];
  }

  void worker(uint64_t seed) {
    std::mt19937_64 rng(seed);
    while (!stop.load(std::memory_order_relaxed)) {
      Batch b;
      b.images.resize(size_t(batch) * img_size * img_size * 3);
      b.labels.resize(batch, 0);
      for (int i = 0; i < batch; ++i) {
        // skip to the next index on decode failure (corrupt file) rather
        // than aborting; in shuffle mode this consumes the bad file's slot
        for (int attempt = 0; attempt < 16; ++attempt) {
          size_t idx = next_index(rng);
          Image img;
          if (decode_file(files[idx], &img) && img.w > 0 && img.h > 0) {
            resize_bilinear(img, img_size,
                            b.images.data() + size_t(i) * img_size * img_size * 3);
            if (!labels.empty()) b.labels[i] = labels[idx];
            break;
          }
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_put.wait(lk, [&] { return queue.size() < queue_cap || stop; });
      if (stop) return;
      queue.push_back(std::move(b));
      cv_get.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// mode: 0 = iid with replacement, 1 = shuffled epochs (default traversal).
// start_count: images already consumed (resume cursor; shuffle mode only).
void* bt_loader_create(const char** paths, int n_files, const int32_t* labels,
                       int img_size, int batch, int n_threads, int queue_cap,
                       uint64_t seed, int mode, uint64_t start_count) {
  if (n_files <= 0 || batch <= 0 || img_size <= 0) return nullptr;
  auto* L = new Loader();
  L->files.assign(paths, paths + n_files);
  if (labels) L->labels.assign(labels, labels + n_files);
  L->img_size = img_size;
  L->batch = batch;
  L->queue_cap = queue_cap > 0 ? queue_cap : 4;
  L->mode = mode;
  L->base_seed = seed;
  if (mode != 0) L->seek(start_count);
  for (int t = 0; t < (n_threads > 0 ? n_threads : 4); ++t)
    L->threads.emplace_back(&Loader::worker, L, seed * 0x9E3779B97F4A7C15ULL + t);
  return L;
}

// Blocking: fills out_images [batch, S, S, 3] u8 and out_labels [batch] i32.
int bt_loader_next(void* handle, uint8_t* out_images, int32_t* out_labels) {
  auto* L = static_cast<Loader*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_get.wait(lk, [&] { return !L->queue.empty() || L->stop; });
    if (L->stop && L->queue.empty()) return -1;
    b = std::move(L->queue.front());
    L->queue.pop_front();
    L->cv_put.notify_one();
  }
  std::memcpy(out_images, b.images.data(), b.images.size());
  if (out_labels) std::memcpy(out_labels, b.labels.data(), b.labels.size() * 4);
  return 0;
}

void bt_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop = true;
  L->cv_put.notify_all();
  L->cv_get.notify_all();
  for (auto& t : L->threads) t.join();
  delete L;
}

// Stateless position-based decode: fill out_images[i] with the decoded +
// resized file at indices[i], fanned out over n_threads. The multi-host
// ordered loader (data/pipeline.py ShardedOrderedLoader) computes WHICH
// files belong to global batch k in Python (a pure function of (seed, k))
// and uses this purely as a parallel decode+resize primitive — ordering
// and traversal stay in one place, native speed stays available under
// multi-host. Threads are spawned per call: creation cost (~tens of µs
// each) is noise against image decode (~ms each). Failed slots are
// zeroed; returns the number of failures (0 = all decoded).
int bt_decode_indices(const char** paths, int n_files, int img_size,
                      const int64_t* indices, int count, int n_threads,
                      uint8_t* out_images, const int32_t* labels,
                      int32_t* out_labels) {
  if (n_files <= 0 || img_size <= 0 || count <= 0) return -1;
  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  const size_t stride = size_t(img_size) * img_size * 3;
  auto work = [&] {
    int i;
    while ((i = next.fetch_add(1)) < count) {
      int64_t fi = indices[i];
      uint8_t* dst = out_images + size_t(i) * stride;
      bool ok = false;
      if (fi >= 0 && fi < n_files) {
        Image img;
        if (decode_file(paths[fi], &img) && img.w > 0 && img.h > 0) {
          resize_bilinear(img, img_size, dst);
          ok = true;
        }
        if (labels && out_labels) out_labels[i] = labels[fi];
      }
      if (!ok) {
        std::memset(dst, 0, stride);
        failures.fetch_add(1);
      }
    }
  };
  int nt = n_threads > 0 ? n_threads : 4;
  if (nt > count) nt = count;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
