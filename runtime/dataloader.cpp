// Native data-loading runtime for segmif-tpu.
//
// The reference feeds its training loop through torch DataLoader worker
// PROCESSES doing PIL decodes (/root/reference/train.py:287-294). Here the
// host-side input pipeline is native: libpng/libjpeg decode + bilinear
// resize + a std::thread pool that keeps a bounded queue of ready batches,
// exposed to Python through a plain C ABI (ctypes — no pybind11 in this
// image). The TPU-side augmentation stays in jitted JAX (data/augment.py);
// this runtime removes the Python/GIL decode bottleneck in front of it.
//
// Build: g++ -O3 -fPIC -shared dataloader.cpp -lpng -ljpeg -o libsegmif_io.so

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, uint8
  int h = 0, w = 0, c = 0;
  bool ok = false;
};

// ----------------------------------------------------------- PNG decode ----

Image decode_png(FILE* f) {
  Image img;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  img.h = static_cast<int>(h);
  img.w = static_cast<int>(w);
  img.c = channels;
  img.data.resize(static_cast<size_t>(h) * w * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img.data.data() + static_cast<size_t>(y) * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

// ---------------------------------------------------------- JPEG decode ----

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  img.h = cinfo.output_height;
  img.w = cinfo.output_width;
  img.c = cinfo.output_components;
  img.data.resize(static_cast<size_t>(img.h) * img.w * img.c);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = img.data.data() +
                   static_cast<size_t>(cinfo.output_scanline) * img.w * img.c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  Image img;
  FILE* f = fopen(path, "rb");
  if (!f) return img;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, f) != 4) {
    fclose(f);
    return img;
  }
  rewind(f);
  if (magic[0] == 0x89 && magic[1] == 'P') {
    img = decode_png(f);
  } else if (magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  }
  fclose(f);
  return img;
}

// ------------------------------------------------------- bilinear resize ----

// Half-pixel-center bilinear resize, uint8 HWC -> float32 HWC in [0, 255]
// (matches jax.image.resize / torch interpolate align_corners=False).
void resize_bilinear_f32(const Image& src, int oh, int ow, int oc,
                         float* out) {
  const float sy = static_cast<float>(src.h) / oh;
  const float sx = static_cast<float>(src.w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= src.h ? src.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= src.h ? src.h - 1 : y0 + 1);
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= src.w ? src.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= src.w ? src.w - 1 : x0 + 1);
      for (int ch = 0; ch < oc; ++ch) {
        int sc = src.c == 1 ? 0 : (ch < src.c ? ch : src.c - 1);
        auto at = [&](int yy, int xx) -> float {
          return src.data[(static_cast<size_t>(yy) * src.w + xx) * src.c + sc];
        };
        float v = (1 - wy) * ((1 - wx) * at(y0c, x0c) + wx * at(y0c, x1c)) +
                  wy * ((1 - wx) * at(y1c, x0c) + wx * at(y1c, x1c));
        out[(static_cast<size_t>(y) * ow + x) * oc + ch] = v;
      }
    }
  }
}

// Copy/expand channels without resize.
void to_f32(const Image& src, int oc, float* out) {
  const size_t n = static_cast<size_t>(src.h) * src.w;
  for (size_t i = 0; i < n; ++i) {
    for (int ch = 0; ch < oc; ++ch) {
      int sc = src.c == 1 ? 0 : (ch < src.c ? ch : src.c - 1);
      out[i * oc + ch] = src.data[i * src.c + sc];
    }
  }
}

// ------------------------------------------------------------ thread pool --

struct BatchRequest {
  std::vector<std::string> paths;  // batch_size * items_per_sample paths
  int64_t id = 0;
};

struct BatchResult {
  std::vector<float> data;  // concatenated item planes
  int64_t id = 0;
};

struct Loader {
  int batch_size;
  int items;        // images per sample (e.g. ir, vis, guide, label = 4)
  int oh, ow, oc;   // output geometry per image
  int resize;       // 0: require exact size, 1: bilinear resize
  std::vector<std::string> paths;  // flat [n_samples][items]
  int n_samples;
  std::vector<int> order;
  uint64_t seed;
  size_t cursor = 0;

  std::queue<BatchResult> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  size_t max_queue;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;
  std::mutex order_mu;

  size_t sample_floats() const {
    return static_cast<size_t>(items) * oh * ow * oc;
  }

  void shuffle_order() {
    // xorshift permutation
    uint64_t s = seed++;
    for (int i = n_samples - 1; i > 0; --i) {
      s ^= s << 13;
      s ^= s >> 7;
      s ^= s << 17;
      int j = static_cast<int>(s % (i + 1));
      std::swap(order[i], order[j]);
    }
  }

  bool next_indices(std::vector<int>* out) {
    std::lock_guard<std::mutex> lk(order_mu);
    out->clear();
    for (int i = 0; i < batch_size; ++i) {
      if (cursor >= static_cast<size_t>(n_samples)) {
        shuffle_order();
        cursor = 0;
      }
      out->push_back(order[cursor++]);
    }
    return true;
  }

  void worker() {
    std::vector<int> idxs;
    while (!stop.load()) {
      next_indices(&idxs);
      BatchResult res;
      res.data.assign(static_cast<size_t>(batch_size) * sample_floats(), 0.f);
      for (int b = 0; b < batch_size; ++b) {
        for (int it = 0; it < items; ++it) {
          const std::string& p = paths[static_cast<size_t>(idxs[b]) * items + it];
          Image img = decode_file(p.c_str());
          float* dst = res.data.data() +
                       (static_cast<size_t>(b) * items + it) *
                           static_cast<size_t>(oh) * ow * oc;
          if (!img.ok) continue;  // leave zeros on decode failure
          if (img.h == oh && img.w == ow && !resize) {
            to_f32(img, oc, dst);
          } else {
            resize_bilinear_f32(img, oh, ow, oc, dst);
          }
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_queue || stop.load(); });
      if (stop.load()) return;
      ready.push(std::move(res));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// Decode one image file into caller-allocated float32 buffer [oh*ow*oc].
// resize=0 requires the file to match (oh, ow) exactly. Returns 0 on
// success.
int sfl_decode(const char* path, float* out, int oh, int ow, int oc,
               int resize) {
  Image img = decode_file(path);
  if (!img.ok) return 1;
  if (img.h == oh && img.w == ow) {
    to_f32(img, oc, out);
    return 0;
  }
  if (!resize) return 2;
  resize_bilinear_f32(img, oh, ow, oc, out);
  return 0;
}

// Probe an image's dimensions. Returns 0 on success.
int sfl_probe(const char* path, int* h, int* w, int* c) {
  Image img = decode_file(path);
  if (!img.ok) return 1;
  *h = img.h;
  *w = img.w;
  *c = img.c;
  return 0;
}

void* sfl_loader_create(const char** paths, int n_samples, int items,
                        int batch_size, int oh, int ow, int oc, int resize,
                        int n_threads, int queue_depth, uint64_t seed) {
  Loader* L = new Loader();
  L->batch_size = batch_size;
  L->items = items;
  L->oh = oh;
  L->ow = ow;
  L->oc = oc;
  L->resize = resize;
  L->n_samples = n_samples;
  L->seed = seed | 1;
  L->max_queue = queue_depth;
  L->paths.reserve(static_cast<size_t>(n_samples) * items);
  for (int i = 0; i < n_samples * items; ++i) L->paths.emplace_back(paths[i]);
  L->order.resize(n_samples);
  for (int i = 0; i < n_samples; ++i) L->order[i] = i;
  L->shuffle_order();
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

// Blocks until a batch is ready; fills caller buffer
// [batch, items, oh, ow, oc] float32. Returns 0 on success.
int sfl_loader_next(void* handle, float* out) {
  Loader* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_ready.wait(lk, [&] { return !L->ready.empty() || L->stop.load(); });
  if (L->stop.load()) return 1;
  BatchResult res = std::move(L->ready.front());
  L->ready.pop();
  L->cv_space.notify_one();
  lk.unlock();
  std::memcpy(out, res.data.data(), res.data.size() * sizeof(float));
  return 0;
}

void sfl_loader_destroy(void* handle) {
  Loader* L = static_cast<Loader*>(handle);
  L->stop.store(true);
  L->cv_ready.notify_all();
  L->cv_space.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
