// Native data-loader for gsavatar: threaded frame decode + preprocessing.
//
// The reference does this per frame in Python/OpenCV on the main thread
// (dataset/zjumocap.py:304-328 — imread, undistort, resize, mask composite),
// which serializes the startup preload and steals host time from the train
// loop. Here the identical OpenCV pipeline runs in C++ worker threads:
//   * gs_decode_frame  — one frame, synchronous (drop-in for the Python path)
//   * gs_decode_batch  — N frames across a thread pool (preload path)
//   * gs_prefetcher_*  — background lookahead decoding following a schedule
//     the training loop sets per epoch (non-preload path)
// All outputs are float32, image HWC RGB in [0,1] with the background zeroed
// or whitened by the mask, mask {0,1} — bit-identical to the Python recipe
// because both call the same OpenCV kernels in the same order.
//
// Exposed as a plain C ABI consumed via ctypes (gsavatar/native/__init__.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/calib3d.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct FrameSpec {
  std::string img_path;
  std::string mask_path;
  double K[9];
  double dist[5];
  int h_out, w_out;
  bool white_bg;
  bool lanczos;
};

// identical math to gsavatar/data/zju_format.py:load_image_mask
int decode_one(const FrameSpec& s, float* out_img, float* out_mask,
               char* err, int err_len) {
  cv::Mat bgr = cv::imread(s.img_path, cv::IMREAD_COLOR);
  if (bgr.empty()) {
    snprintf(err, err_len, "imread failed: %s", s.img_path.c_str());
    return 1;
  }
  cv::Mat mask = cv::imread(s.mask_path, cv::IMREAD_GRAYSCALE);
  if (mask.empty()) {
    snprintf(err, err_len, "imread failed: %s", s.mask_path.c_str());
    return 1;
  }
  cv::Mat rgb;
  cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);

  cv::Mat K(3, 3, CV_64F, const_cast<double*>(s.K));
  cv::Mat dist(1, 5, CV_64F, const_cast<double*>(s.dist));
  cv::Mat und_img, und_mask;
  cv::undistort(rgb, und_img, K, dist);
  cv::undistort(mask, und_mask, K, dist);

  cv::Mat rimg, rmask;
  cv::resize(und_img, rimg, cv::Size(s.w_out, s.h_out), 0, 0,
             s.lanczos ? cv::INTER_LANCZOS4 : cv::INTER_LINEAR);
  cv::resize(und_mask, rmask, cv::Size(s.w_out, s.h_out), 0, 0,
             cv::INTER_NEAREST);

  const float bg = s.white_bg ? 1.0f : 0.0f;
  for (int y = 0; y < s.h_out; ++y) {
    const uint8_t* ip = rimg.ptr<uint8_t>(y);
    const uint8_t* mp = rmask.ptr<uint8_t>(y);
    float* oi = out_img + static_cast<size_t>(y) * s.w_out * 3;
    float* om = out_mask + static_cast<size_t>(y) * s.w_out;
    for (int x = 0; x < s.w_out; ++x) {
      const bool fg = mp[x] != 0;
      om[x] = fg ? 1.0f : 0.0f;
      for (int c = 0; c < 3; ++c)
        oi[x * 3 + c] = fg ? ip[x * 3 + c] * (1.0f / 255.0f) : bg;
    }
  }
  return 0;
}

FrameSpec make_spec(const char* img_path, const char* mask_path,
                    const double* K, const double* dist, int h_out, int w_out,
                    int white_bg, int lanczos) {
  FrameSpec s;
  s.img_path = img_path;
  s.mask_path = mask_path;
  std::memcpy(s.K, K, sizeof(s.K));
  std::memcpy(s.dist, dist, sizeof(s.dist));
  s.h_out = h_out;
  s.w_out = w_out;
  s.white_bg = white_bg != 0;
  s.lanczos = lanczos != 0;
  return s;
}

struct Prefetcher {
  std::vector<FrameSpec> specs;
  size_t img_elems, mask_elems;
  int lookahead;

  std::mutex mu;
  std::condition_variable cv_ready;  // signals results map changes
  std::condition_variable cv_work;   // signals schedule/cursor changes
  std::map<int, std::pair<std::vector<float>, std::vector<float>>> ready;
  std::vector<int> schedule;  // decode order (epoch permutation)
  size_t next_to_decode = 0;  // index into schedule
  size_t cursor = 0;          // consumer position in schedule
  bool stop = false;
  std::vector<std::thread> workers;
  std::string error;

  void worker() {
    for (;;) {
      int item;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] {
          return stop ||
                 (next_to_decode < schedule.size() &&
                  next_to_decode < cursor + static_cast<size_t>(lookahead) &&
                  ready.size() < static_cast<size_t>(2 * lookahead));
        });
        if (stop) return;
        item = schedule[next_to_decode++];
      }
      std::vector<float> img(img_elems), msk(mask_elems);
      char err[512] = {0};
      if (decode_one(specs[item], img.data(), msk.data(), err, sizeof(err))) {
        std::lock_guard<std::mutex> lk(mu);
        if (error.empty()) error = err;
        cv_ready.notify_all();
        continue;
      }
      std::lock_guard<std::mutex> lk(mu);
      ready.emplace(item, std::make_pair(std::move(img), std::move(msk)));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

int gs_decode_frame(const char* img_path, const char* mask_path,
                    const double* K, const double* dist, int h_out, int w_out,
                    int white_bg, int lanczos, float* out_img,
                    float* out_mask, char* err, int err_len) {
  return decode_one(
      make_spec(img_path, mask_path, K, dist, h_out, w_out, white_bg,
                lanczos),
      out_img, out_mask, err, err_len);
}

// Decode n frames in parallel. Paths are arrays of C strings; K/dist are
// per-frame rows (n x 9, n x 5). Outputs are contiguous (n, h, w, 3) and
// (n, h, w). Returns 0 on success; on failure the first error lands in err.
int gs_decode_batch(int n, const char* const* img_paths,
                    const char* const* mask_paths, const double* K,
                    const double* dist, int h_out, int w_out, int white_bg,
                    int lanczos, int n_threads, float* out_imgs,
                    float* out_masks, char* err, int err_len) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  std::atomic<int> next(0), rc(0);
  const size_t img_elems = static_cast<size_t>(h_out) * w_out * 3;
  const size_t mask_elems = static_cast<size_t>(h_out) * w_out;
  std::mutex err_mu;
  auto run = [&] {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      char local_err[512] = {0};
      FrameSpec s = make_spec(img_paths[i], mask_paths[i], K + 9 * i,
                              dist + 5 * i, h_out, w_out, white_bg, lanczos);
      if (decode_one(s, out_imgs + img_elems * i, out_masks + mask_elems * i,
                     local_err, sizeof(local_err))) {
        std::lock_guard<std::mutex> lk(err_mu);
        if (rc.exchange(1) == 0) snprintf(err, err_len, "%s", local_err);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < std::min(n_threads, n); ++t) pool.emplace_back(run);
  for (auto& t : pool) t.join();
  return rc.load();
}

void* gs_prefetcher_create(int n, const char* const* img_paths,
                           const char* const* mask_paths, const double* K,
                           const double* dist, int h_out, int w_out,
                           int white_bg, int lanczos, int lookahead,
                           int n_threads) {
  auto* p = new Prefetcher();
  p->specs.reserve(n);
  for (int i = 0; i < n; ++i)
    p->specs.push_back(make_spec(img_paths[i], mask_paths[i], K + 9 * i,
                                 dist + 5 * i, h_out, w_out, white_bg,
                                 lanczos));
  p->img_elems = static_cast<size_t>(h_out) * w_out * 3;
  p->mask_elems = static_cast<size_t>(h_out) * w_out;
  p->lookahead = lookahead > 0 ? lookahead : 4;
  if (n_threads <= 0) n_threads = 2;
  for (int t = 0; t < n_threads; ++t)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// Replace the decode schedule (e.g. the next epoch's frame permutation).
// Items already decoded but not consumed are dropped.
void gs_prefetcher_set_schedule(void* handle, const int* order, int count) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::lock_guard<std::mutex> lk(p->mu);
  p->schedule.assign(order, order + count);
  p->next_to_decode = 0;
  p->cursor = 0;
  p->ready.clear();
  p->cv_work.notify_all();
}

// Blocking fetch of the next scheduled item; returns its dataset index, or
// -1 when the schedule is exhausted, -2 on decode error.
int gs_prefetcher_next(void* handle, float* out_img, float* out_mask) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->cursor >= p->schedule.size()) return -1;
  const int item = p->schedule[p->cursor];
  p->cv_ready.wait(lk, [&] {
    return p->ready.count(item) || !p->error.empty();
  });
  if (!p->ready.count(item)) return -2;
  auto it = p->ready.find(item);
  std::memcpy(out_img, it->second.first.data(),
              p->img_elems * sizeof(float));
  std::memcpy(out_mask, it->second.second.data(),
              p->mask_elems * sizeof(float));
  p->ready.erase(it);
  p->cursor++;
  p->cv_work.notify_all();
  return item;
}

int gs_prefetcher_error(void* handle, char* err, int err_len) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::lock_guard<std::mutex> lk(p->mu);
  if (p->error.empty()) return 0;
  snprintf(err, err_len, "%s", p->error.c_str());
  return 1;
}

void gs_prefetcher_destroy(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv_work.notify_all();
  }
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
