// Threaded image decode + prefetch pool.
//
// Native data loader for the training loop — the role the reference fills
// with torch DataLoader worker processes (train_single.py:53,
// train_post.py:193: num_workers=8, prefetch_factor=1). Decodes JPEG/PNG on
// a thread pool into float32 CHW buffers (optionally downscaled to
// max_width, matching utils/camera_utils.py:19-70's 1600px policy) and
// serves them through a bounded cache keyed by image index. Exposed to
// Python via a plain C ABI (ctypes — no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <cstddef>
extern "C" {
#include <jpeglib.h>
}
#include <png.h>

namespace {

struct Image {
  int h = 0, w = 0, c = 3;
  std::vector<float> chw;  // [3, h, w]
  bool ok = false;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const std::string& path, std::vector<uint8_t>& rgb, int& w,
                 int& h) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(size_t(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + size_t(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_png(const std::string& path, std::vector<uint8_t>& rgb, int& w,
                int& h) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  rgb.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; y++) rows[y] = rgb.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

void to_chw_resized(const std::vector<uint8_t>& rgb, int w, int h,
                    int max_width, Image& out) {
  int ow = w, oh = h;
  if (max_width > 0 && w > max_width) {
    ow = max_width;
    oh = int(int64_t(h) * max_width / w);
  }
  out.w = ow;
  out.h = oh;
  out.chw.resize(size_t(3) * ow * oh);
  const float sx = float(w) / ow, sy = float(h) / oh;
  for (int y = 0; y < oh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : int(fy);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < ow; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : int(fx);
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int ch = 0; ch < 3; ch++) {
        float v00 = rgb[(size_t(y0) * w + x0) * 3 + ch];
        float v01 = rgb[(size_t(y0) * w + x1) * 3 + ch];
        float v10 = rgb[(size_t(y1) * w + x0) * 3 + ch];
        float v11 = rgb[(size_t(y1) * w + x1) * 3 + ch];
        float v = v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
                  v10 * (1 - wx) * wy + v11 * wx * wy;
        out.chw[(size_t(ch) * oh + y) * ow + x] = v / 255.0f;
      }
    }
  }
  out.ok = true;
}

struct Loader {
  std::vector<std::string> paths;
  int max_width = 1600;
  size_t cache_cap = 64;

  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_work;
  std::map<int, std::shared_ptr<Image>> cache;
  std::deque<int> lru;
  std::deque<int> queue;
  std::vector<int> inflight;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void evict_locked() {
    while (cache.size() > cache_cap && !lru.empty()) {
      int victim = lru.front();
      lru.pop_front();
      cache.erase(victim);
    }
  }

  std::shared_ptr<Image> decode(int idx) {
    auto img = std::make_shared<Image>();
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    const std::string& p = paths[idx];
    bool ok = false;
    auto dot = p.rfind('.');
    std::string ext = dot == std::string::npos ? "" : p.substr(dot);
    for (auto& c : ext) c = tolower(c);
    if (ext == ".jpg" || ext == ".jpeg")
      ok = decode_jpeg(p, rgb, w, h);
    else if (ext == ".png")
      ok = decode_png(p, rgb, w, h);
    else if (decode_jpeg(p, rgb, w, h) || decode_png(p, rgb, w, h))
      ok = true;
    if (ok) to_chw_resized(rgb, w, h, max_width, *img);
    return img;
  }

  void worker() {
    while (true) {
      int idx = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop) return;
        idx = queue.front();
        queue.pop_front();
        if (cache.count(idx)) continue;
        inflight.push_back(idx);
      }
      auto img = decode(idx);
      {
        std::unique_lock<std::mutex> lk(mu);
        cache[idx] = img;
        lru.push_back(idx);
        inflight.erase(std::find(inflight.begin(), inflight.end(), idx));
        evict_locked();
      }
      cv_ready.notify_all();
    }
  }

  void request_locked(int idx) {
    if (idx < 0 || idx >= (int)paths.size()) return;
    if (cache.count(idx)) return;
    if (std::find(inflight.begin(), inflight.end(), idx) != inflight.end())
      return;
    if (std::find(queue.begin(), queue.end(), idx) != queue.end()) return;
    queue.push_back(idx);
  }
};

}  // namespace

extern "C" {

void* hlod_loader_create(const char** paths, int n, int n_threads,
                         int max_width, int cache_cap) {
  auto* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->max_width = max_width;
  L->cache_cap = cache_cap > 0 ? cache_cap : 64;
  int nt = n_threads > 0 ? n_threads : 4;
  for (int i = 0; i < nt; i++) L->workers.emplace_back([L] { L->worker(); });
  return L;
}

void hlod_loader_prefetch(void* handle, const int* idxs, int n) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    for (int i = 0; i < n; i++) L->request_locked(idxs[i]);
  }
  L->cv_work.notify_all();
}

// Blocks until image idx is decoded; returns 0 on success and fills
// (h, w). Call hlod_loader_read to copy out the CHW floats.
int hlod_loader_shape(void* handle, int idx, int* h, int* w) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->request_locked(idx);
  }
  L->cv_work.notify_all();
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_ready.wait(lk, [&] { return L->cache.count(idx) > 0; });
  auto img = L->cache[idx];
  if (!img->ok) return -1;
  *h = img->h;
  *w = img->w;
  return 0;
}

int hlod_loader_read(void* handle, int idx, float* out, int64_t out_len) {
  auto* L = static_cast<Loader*>(handle);
  std::shared_ptr<Image> img;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    auto it = L->cache.find(idx);
    if (it == L->cache.end()) return -1;
    img = it->second;
  }
  if (!img->ok || (int64_t)img->chw.size() > out_len) return -1;
  std::memcpy(out, img->chw.data(), img->chw.size() * sizeof(float));
  return 0;
}

void hlod_loader_destroy(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv_work.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
