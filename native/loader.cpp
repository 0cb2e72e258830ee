// Native async image-loading pipeline for splat_one_tpu.
//
// TPU-native replacement for the reference's host-side data path: torch
// DataLoader worker processes + cv2 (C++) decode/resize/undistort feeding the
// trainer (reference utils/datasets/opensfm.py Dataset __getitem__ +
// gsplat_trainer.py:562-572 DataLoader with 4 workers). Here: a C++ thread
// pool decodes JPEG/PNG (libjpeg/libpng), bilinear-resizes, applies k1/k2
// radial undistortion, and writes float32 [0,1] RGB into caller-provided
// buffers — exposed through a plain C ABI consumed via ctypes (no pybind11
// in this image).
//
// Build: g++ -O3 -shared -fPIC -o libsplatloader.so loader.cpp -ljpeg -lpng
//        (driven by splat_one_tpu/utils/native_loader.py)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h * w * 3
};

// ---------------------------------------------------------------- decoding
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
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

bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->w = int(w);
  out->h = int(h);
  out->rgb.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->rgb.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// --------------------------------------------------- resize + undistortion
inline void bilinear_sample(const Image& im, float x, float y, float* rgb) {
  // clamp-to-edge (matches PIL/cv2 border behavior)
  if (x < 0.f) x = 0.f;
  if (y < 0.f) y = 0.f;
  if (x > im.w - 1.001f) x = im.w - 1.001f;
  if (y > im.h - 1.001f) y = im.h - 1.001f;
  int x0 = int(x), y0 = int(y);
  float fx = x - x0, fy = y - y0;
  const uint8_t* p00 = im.rgb.data() + (size_t(y0) * im.w + x0) * 3;
  const uint8_t* p01 = p00 + 3;
  const uint8_t* p10 = p00 + size_t(im.w) * 3;
  const uint8_t* p11 = p10 + 3;
  for (int c = 0; c < 3; ++c) {
    rgb[c] = ((1 - fx) * (1 - fy) * p00[c] + fx * (1 - fy) * p01[c] +
              (1 - fx) * fy * p10[c] + fx * fy * p11[c]) /
             255.0f;
  }
}

struct Task {
  std::string path;
  int out_w, out_h;
  // intrinsics of the *output* image for undistortion; k1 == k2 == 0 skips it
  float fx, fy, cx, cy, k1, k2;
  float* out;          // out_h * out_w * 3 float32
  int ticket;
};

void process(const Task& t, const Image& im) {
  const float sx = float(im.w) / t.out_w;
  const float sy = float(im.h) / t.out_h;
  const bool distort = (t.k1 != 0.f || t.k2 != 0.f);
  for (int y = 0; y < t.out_h; ++y) {
    for (int x = 0; x < t.out_w; ++x) {
      float u = x + 0.5f, v = y + 0.5f;
      if (distort) {
        // forward-distort the undistorted pixel to find its source
        float xn = (u - t.cx) / t.fx;
        float yn = (v - t.cy) / t.fy;
        float r2 = xn * xn + yn * yn;
        float d = 1.f + r2 * (t.k1 + t.k2 * r2);
        u = xn * d * t.fx + t.cx;
        v = yn * d * t.fy + t.cy;
      }
      bilinear_sample(im, u * sx - 0.5f, v * sy - 0.5f,
                      t.out + (size_t(y) * t.out_w + x) * 3);
    }
  }
}

// ------------------------------------------------------------- thread pool
class Loader {
 public:
  explicit Loader(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { worker(); });
  }
  ~Loader() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void submit(Task task) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      queue_.push(std::move(task));
    }
    cv_.notify_one();
  }

  // blocks until the given ticket completed; returns 1 on success
  int wait(int ticket) {
    std::unique_lock<std::mutex> lk(done_mu_);
    done_cv_.wait(lk, [&] { return done_.count(ticket) > 0; });
    int ok = done_[ticket];
    done_.erase(ticket);
    return ok;
  }

 private:
  void worker() {
    for (;;) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        t = std::move(queue_.front());
        queue_.pop();
      }
      Image im;
      int ok = decode_file(t.path, &im) ? 1 : 0;
      if (ok) process(t, im);
      {
        std::unique_lock<std::mutex> lk(done_mu_);
        done_[t.ticket] = ok;
      }
      done_cv_.notify_all();
    }
  }

  std::vector<std::thread> workers_;
  std::queue<Task> queue_;
  std::mutex mu_, done_mu_;
  std::condition_variable cv_, done_cv_;
  std::unordered_map<int, int> done_;
  bool stop_;
};

std::mutex g_mu;
std::unordered_map<int, Loader*> g_loaders;
int g_next_id = 1;
std::atomic<int> g_next_ticket{1};

}  // namespace

extern "C" {

int loader_create(int n_threads) {
  std::unique_lock<std::mutex> lk(g_mu);
  int id = g_next_id++;
  g_loaders[id] = new Loader(n_threads > 0 ? n_threads : 4);
  return id;
}

void loader_destroy(int id) {
  Loader* l = nullptr;
  {
    std::unique_lock<std::mutex> lk(g_mu);
    auto it = g_loaders.find(id);
    if (it == g_loaders.end()) return;
    l = it->second;
    g_loaders.erase(it);
  }
  delete l;
}

// returns a ticket to pass to loader_wait
int loader_submit(int id, const char* path, int out_w, int out_h, float fx,
                  float fy, float cx, float cy, float k1, float k2,
                  float* out) {
  Loader* l = nullptr;
  {
    std::unique_lock<std::mutex> lk(g_mu);
    auto it = g_loaders.find(id);
    if (it == g_loaders.end()) return -1;
    l = it->second;
  }
  int ticket = g_next_ticket++;
  l->submit(Task{path, out_w, out_h, fx, fy, cx, cy, k1, k2, out, ticket});
  return ticket;
}

int loader_wait(int id, int ticket) {
  Loader* l = nullptr;
  {
    std::unique_lock<std::mutex> lk(g_mu);
    auto it = g_loaders.find(id);
    if (it == g_loaders.end()) return 0;
    l = it->second;
  }
  return l->wait(ticket);
}

}  // extern "C"
