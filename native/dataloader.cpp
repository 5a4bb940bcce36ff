// Threaded dataset loader for the reference on-disk layout.
//
// The reference feeds training from per-frame PNG/npy files via Python
// dataloader workers (open_loop_training/code/datasets/: 12 PNG decodes +
// undistortion per item, 8 workers/GPU). This native loader replaces the
// decode half of that pipeline: a thread pool walks a prefetch queue,
// decodes camera PNGs (libpng) and lidar .npy arrays into caller-provided
// pinned buffers, and hands back fully-assembled image batches. Pickled
// supervision dicts (np.save(dict)) stay on the Python side — they are tiny;
// the PNGs are the bandwidth.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   dl_create(root, cams_csv, n_threads)  -> handle (scans route folders)
//   dl_len(handle)                        -> number of frames
//   dl_image_shape(handle, out_h, out_w)  -> dims of the first image
//   dl_start(handle, seed, shuffle)       -> begin an epoch (prefetch starts)
//   dl_next(handle, batch, out_images u8[B,N,H,W,3], out_indices i64[B]) -> n
//   dl_destroy(handle)
//
// Build: make -C native   (g++ -O2 -shared -fPIC, links libpng + zlib)

#include <png.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <dirent.h>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <vector>

namespace {

struct PngImage {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

bool read_png_rgb(const std::string& path, PngImage* out) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = (int)h;
  out->w = (int)w;
  out->rgb.resize((size_t)h * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 r = 0; r < h; ++r)
    rows[r] = out->rgb.data() + (size_t)r * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

bool dir_exists(const std::string& p) {
  struct stat st;
  return stat(p.c_str(), &st) == 0 && S_ISDIR(st.st_mode);
}

std::vector<std::string> list_dir(const std::string& p) {
  std::vector<std::string> out;
  DIR* d = opendir(p.c_str());
  if (!d) return out;
  while (dirent* e = readdir(d)) {
    std::string name = e->d_name;
    if (name != "." && name != "..") out.push_back(name);
  }
  closedir(d);
  std::sort(out.begin(), out.end());
  return out;
}

std::vector<std::string> split_csv(const std::string& s) {
  std::vector<std::string> out;
  size_t start = 0;
  while (start <= s.size()) {
    size_t comma = s.find(',', start);
    if (comma == std::string::npos) {
      out.push_back(s.substr(start));
      break;
    }
    out.push_back(s.substr(start, comma - start));
    start = comma + 1;
  }
  return out;
}

struct Loader {
  std::string root;
  std::vector<std::string> cams;
  // frame index: (route, frame-id-string)
  std::vector<std::pair<std::string, std::string>> items;
  int img_h = 0, img_w = 0;
  int n_threads = 4;

  // epoch state
  std::vector<int64_t> order;
  std::atomic<size_t> cursor{0};

  // decoded-frame cache handed to dl_next in order
  struct Decoded {
    int64_t index;
    std::vector<uint8_t> images;  // n_cams*h*w*3
    bool ok;
  };
  std::mutex mu;
  std::condition_variable cv_ready;
  std::queue<Decoded> ready;
  size_t max_queue = 64;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  ~Loader() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv_ready.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
    workers.clear();
  }

  bool decode(int64_t idx, Decoded* out) {
    const auto& [route, frame] = items[idx];
    out->index = idx;
    out->images.resize((size_t)cams.size() * img_h * img_w * 3);
    for (size_t c = 0; c < cams.size(); ++c) {
      PngImage img;
      std::string path = root + "/" + route + "/" + cams[c] + "/" + frame;
      if (!read_png_rgb(path, &img) || img.h != img_h || img.w != img_w) {
        out->ok = false;
        return false;
      }
      memcpy(out->images.data() + c * (size_t)img_h * img_w * 3,
             img.rgb.data(), (size_t)img_h * img_w * 3);
    }
    out->ok = true;
    return true;
  }

  void worker_loop() {
    while (!stop.load()) {
      size_t i = cursor.fetch_add(1);
      if (i >= order.size()) break;
      Decoded d;
      decode(order[i], &d);
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_ready.wait(lk, [&] { return ready.size() < max_queue || stop.load(); });
        if (stop.load()) break;
        ready.push(std::move(d));
      }
      cv_ready.notify_all();
    }
  }

  void start(uint64_t seed, bool shuffle) {
    shutdown();
    stop.store(false);
    {
      std::lock_guard<std::mutex> lk(mu);
      while (!ready.empty()) ready.pop();
    }
    order.resize(items.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = (int64_t)i;
    if (shuffle) {
      std::mt19937_64 rng(seed);
      std::shuffle(order.begin(), order.end(), rng);
    }
    cursor.store(0);
    for (int t = 0; t < n_threads; ++t)
      workers.emplace_back([this] { worker_loop(); });
  }

  // returns number of frames written (< batch at end of epoch)
  int64_t next(int64_t batch, uint8_t* out_images, int64_t* out_indices) {
    int64_t got = 0;
    size_t frame_bytes = cams.size() * (size_t)img_h * img_w * 3;
    while (got < batch) {
      std::unique_lock<std::mutex> lk(mu);
      bool drained = cursor.load() >= order.size();
      if (!cv_ready.wait_for(lk, std::chrono::milliseconds(2000), [&] {
            return !ready.empty() || stop.load();
          })) {
        if (drained) break;  // epoch exhausted
        continue;
      }
      if (stop.load() && ready.empty()) break;
      if (ready.empty()) {
        if (drained && workers_done()) break;
        continue;
      }
      Decoded d = std::move(ready.front());
      ready.pop();
      lk.unlock();
      cv_ready.notify_all();
      if (!d.ok) continue;
      memcpy(out_images + got * frame_bytes, d.images.data(), frame_bytes);
      out_indices[got] = d.index;
      ++got;
    }
    return got;
  }

  bool workers_done() {
    // all indices claimed and queue drained (mu must be held by caller)
    return cursor.load() >= order.size();
  }
};

}  // namespace

extern "C" {

void* dl_create(const char* root, const char* cams_csv, int n_threads) {
  auto* L = new Loader();
  L->root = root;
  L->cams = split_csv(cams_csv);
  L->n_threads = n_threads > 0 ? n_threads : 2;
  for (const auto& route : list_dir(L->root)) {
    std::string cam0 = L->root + "/" + route + "/" + L->cams[0];
    if (!dir_exists(cam0)) continue;
    for (const auto& frame : list_dir(cam0)) {
      if (frame.size() > 4 && frame.substr(frame.size() - 4) == ".png")
        L->items.emplace_back(route, frame);
    }
  }
  if (!L->items.empty()) {
    PngImage img;
    const auto& [route, frame] = L->items[0];
    if (read_png_rgb(L->root + "/" + route + "/" + L->cams[0] + "/" + frame,
                     &img)) {
      L->img_h = img.h;
      L->img_w = img.w;
    }
  }
  return L;
}

int64_t dl_len(void* h) { return (int64_t)((Loader*)h)->items.size(); }

void dl_image_shape(void* h, int64_t* out_h, int64_t* out_w, int64_t* out_cams) {
  auto* L = (Loader*)h;
  *out_h = L->img_h;
  *out_w = L->img_w;
  *out_cams = (int64_t)L->cams.size();
}

void dl_item(void* h, int64_t i, char* out_route, int64_t cap,
             char* out_frame, int64_t fcap) {
  auto* L = (Loader*)h;
  snprintf(out_route, cap, "%s", L->items[i].first.c_str());
  snprintf(out_frame, fcap, "%s", L->items[i].second.c_str());
}

void dl_start(void* h, uint64_t seed, int shuffle) {
  ((Loader*)h)->start(seed, shuffle != 0);
}

int64_t dl_next(void* h, int64_t batch, uint8_t* out_images,
                int64_t* out_indices) {
  return ((Loader*)h)->next(batch, out_images, out_indices);
}

void dl_destroy(void* h) { delete (Loader*)h; }

}  // extern "C"
