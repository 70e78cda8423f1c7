// Native host data service for prepared-KITTI 3-frame stacks.
//
// TPU-side training is fed by the host: each sample is a stacked [3H, W, 3]
// PNG/JPEG that must be decoded, split into thirds, resized to the training
// resolution, optionally h-flipped, and packed uint8-BGR into a batch buffer
// (the jitted step normalizes on device). The reference does this inside
// torch's C++ DataLoader workers (/root/reference/train.py:125 num_workers=8,
// core/dataset/kitti_prepared.py:50-66 imread/resize); this file is the
// TPU-framework equivalent: a pthread worker pool filling a ring of
// preallocated batch buffers, driven from Python over a C ABI (ctypes), so
// the single-core hosts that front TPU slices spend their cycles in libpng/
// libjpeg/SIMD-friendly loops instead of the interpreter.
//
// Pipeline semantics mirror data/loader.py:KittiPreparedDataset.__getitem__
// exactly (decode -> split -> per-third resize -> restack -> flip), with
// sample selection / flip RNG and intrinsics kept on the Python side so the
// sample stream is bit-identical to the pure-Python loader's.
//
// Build: make -C native   (g++ -O3, links libpng16 + libjpeg + pthread)

#include <stddef.h>  // jpeglib.h uses size_t/FILE without including them
#include <stdio.h>

#include <jpeglib.h>
#include <png.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Decode: file bytes -> interleaved BGR8 (cv2.imread channel order; the whole
// framework trains on BGR because the reference's cv2 pipeline does).
// ---------------------------------------------------------------------------

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> bgr;  // h*w*3
};

bool read_file(const char* path, std::vector<uint8_t>* out, std::string* err) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    *err = std::string("open failed: ") + path;
    return false;
  }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    fclose(f);
    *err = std::string("empty file: ") + path;
    return false;
  }
  out->resize((size_t)n);
  size_t got = fread(out->data(), 1, (size_t)n, f);
  fclose(f);
  if (got != (size_t)n) {
    *err = std::string("short read: ") + path;
    return false;
  }
  return true;
}

bool decode_png(const std::vector<uint8_t>& bytes, Image* img,
                std::string* err) {
  png_image pi;
  memset(&pi, 0, sizeof(pi));
  pi.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&pi, bytes.data(), bytes.size())) {
    *err = std::string("png header: ") + pi.message;
    return false;
  }
  pi.format = PNG_FORMAT_BGR;  // libpng expands palette/gray/alpha for us
  img->h = (int)pi.height;
  img->w = (int)pi.width;
  img->bgr.resize(PNG_IMAGE_SIZE(pi));
  if (!png_image_finish_read(&pi, nullptr, img->bgr.data(), 0, nullptr)) {
    *err = std::string("png decode: ") + pi.message;
    png_image_free(&pi);
    return false;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
  char msg[JMSG_LENGTH_MAX];
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, e->msg);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const std::vector<uint8_t>& bytes, Image* img,
                 std::string* err) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    *err = std::string("jpeg decode: ") + jerr.msg;
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, bytes.data(), (unsigned long)bytes.size());
  jpeg_read_header(&cinfo, TRUE);
#ifdef JCS_EXTENSIONS
  cinfo.out_color_space = JCS_EXT_BGR;  // libjpeg-turbo: BGR straight out
  const bool native_bgr = true;
#else
  cinfo.out_color_space = JCS_RGB;
  const bool native_bgr = false;
#endif
  jpeg_start_decompress(&cinfo);
  img->h = (int)cinfo.output_height;
  img->w = (int)cinfo.output_width;
  img->bgr.resize((size_t)img->h * img->w * 3);
  while ((int)cinfo.output_scanline < img->h) {
    uint8_t* row = img->bgr.data() + (size_t)cinfo.output_scanline * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (!native_bgr) {
    uint8_t* p = img->bgr.data();
    for (size_t i = 0, n = (size_t)img->h * img->w; i < n; ++i, p += 3) {
      uint8_t t = p[0];
      p[0] = p[2];
      p[2] = t;
    }
  }
  return true;
}

bool decode_image(const char* path, Image* img, std::string* err) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, &bytes, err)) return false;
  if (bytes.size() >= 8 && bytes[0] == 0x89 && bytes[1] == 'P') {
    return decode_png(bytes, img, err);
  }
  if (bytes.size() >= 2 && bytes[0] == 0xFF && bytes[1] == 0xD8) {
    return decode_jpeg(bytes, img, err);
  }
  *err = std::string("unknown image format: ") + path;
  return false;
}

// Header-only probe (dims without a full decode): PNG IHDR / JPEG SOFn.
bool probe_image(const char* path, int* h, int* w, std::string* err) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    *err = std::string("open failed: ") + path;
    return false;
  }
  uint8_t buf[32];
  size_t n = fread(buf, 1, sizeof(buf), f);
  if (n >= 24 && buf[0] == 0x89 && buf[1] == 'P') {
    // IHDR at fixed offset: width @16, height @20, big-endian u32
    *w = (buf[16] << 24) | (buf[17] << 16) | (buf[18] << 8) | buf[19];
    *h = (buf[20] << 24) | (buf[21] << 16) | (buf[22] << 8) | buf[23];
    fclose(f);
    return true;
  }
  if (n >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    // walk JPEG segments to the first SOF0-SOF15 (excluding DHT/DAC/RST)
    fseek(f, 2, SEEK_SET);
    uint8_t m[4];
    while (fread(m, 1, 4, f) == 4) {
      if (m[0] != 0xFF) break;
      int marker = m[1];
      int len = (m[2] << 8) | m[3];
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
          marker != 0xC8 && marker != 0xCC) {
        uint8_t sof[5];
        if (fread(sof, 1, 5, f) == 5) {
          *h = (sof[1] << 8) | sof[2];
          *w = (sof[3] << 8) | sof[4];
          fclose(f);
          return true;
        }
        break;
      }
      if (len < 2) break;
      fseek(f, len - 2, SEEK_CUR);
    }
  }
  fclose(f);
  *err = std::string("probe failed: ") + path;
  return false;
}

// ---------------------------------------------------------------------------
// Resize: bilinear, cv2.resize INTER_LINEAR conventions (half-pixel centers,
// replicated edges, 11-bit fixed-point weights). Matches cv2 within +-1 LSB;
// tests pin the tolerance (tests/test_native_loader.py).
// ---------------------------------------------------------------------------

struct Axis {
  std::vector<int> i0, i1;
  std::vector<int32_t> w0, w1;  // sum = 2048
};

void build_axis(int src, int dst, Axis* ax) {
  ax->i0.resize(dst);
  ax->i1.resize(dst);
  ax->w0.resize(dst);
  ax->w1.resize(dst);
  const double scale = (double)src / dst;
  for (int x = 0; x < dst; ++x) {
    double fx = (x + 0.5) * scale - 0.5;
    int sx = (int)floor(fx);
    double dx = fx - sx;
    if (sx < 0) {
      sx = 0;
      dx = 0.0;
    }
    if (sx >= src - 1) {
      sx = src - 2 < 0 ? 0 : src - 2;
      dx = src > 1 ? 1.0 : 0.0;
    }
    int32_t w1 = (int32_t)lround(dx * 2048.0);
    ax->i0[x] = sx;
    ax->i1[x] = src > 1 ? sx + 1 : sx;
    ax->w0[x] = 2048 - w1;
    ax->w1[x] = w1;
  }
}

// src: [sh, sw, 3] BGR rows starting at src; dst: [dh, dw, 3] written left-to-
// right or right-to-left (flip) into dst_row pointers.
void resize_bilinear_bgr(const uint8_t* src, int sh, int sw, uint8_t* dst,
                         int dh, int dw, bool flip, const Axis& ay,
                         const Axis& ax) {
  std::vector<int32_t> row0(dw * 3), row1(dw * 3);
  for (int y = 0; y < dh; ++y) {
    const uint8_t* s0 = src + (size_t)ay.i0[y] * sw * 3;
    const uint8_t* s1 = src + (size_t)ay.i1[y] * sw * 3;
    // horizontal pass for both contributing source rows
    for (int x = 0; x < dw; ++x) {
      const int o0 = ax.i0[x] * 3, o1 = ax.i1[x] * 3;
      const int32_t w0 = ax.w0[x], w1 = ax.w1[x];
      for (int c = 0; c < 3; ++c) {
        row0[x * 3 + c] = w0 * s0[o0 + c] + w1 * s0[o1 + c];
        row1[x * 3 + c] = w0 * s1[o0 + c] + w1 * s1[o1 + c];
      }
    }
    uint8_t* d = dst + (size_t)y * dw * 3;
    const int64_t wy0 = ay.w0[y], wy1 = ay.w1[y];
    for (int x = 0; x < dw; ++x) {
      const int xo = flip ? (dw - 1 - x) * 3 : x * 3;
      for (int c = 0; c < 3; ++c) {
        int64_t v = wy0 * row0[x * 3 + c] + wy1 * row1[x * 3 + c];
        d[xo + c] = (uint8_t)((v + (1 << 21)) >> 22);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Service: worker pool + ring of batch buffers.
// ---------------------------------------------------------------------------

struct Job {
  int ticket;
  int slot;  // sample index within the batch
  std::string path;
  bool flip;
};

enum SlotState { FREE, PENDING, READY, FAILED };

struct BatchSlot {
  SlotState state = FREE;
  int ticket = -1;
  int remaining = 0;
  std::vector<uint8_t> buf;
  std::string errmsg;
};

struct Service {
  int batch, th, tw, ring;
  size_t sample_bytes;  // 3*th*tw*3
  std::vector<BatchSlot> slots;
  std::deque<Job> jobs;
  std::mutex mu;
  std::condition_variable cv_jobs, cv_state;
  bool stopping = false;
  std::vector<std::thread> workers;
  std::string last_error;

  // insert-until-full cache of resized (pre-flip) stacks, keyed by path --
  // mirrors loader.py's decode cache (loader.py:92-99)
  size_t cache_budget = 0, cache_used = 0;
  std::unordered_map<std::string, std::vector<uint8_t>> cache;
  std::mutex cache_mu;

  void worker_loop() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_jobs.wait(lk, [&] { return stopping || !jobs.empty(); });
        if (stopping) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      run_job(job);
    }
  }

  // Decode+split+resize into a contiguous [3*th, tw, 3] stack (pre-flip).
  bool make_stack(const std::string& path, std::vector<uint8_t>* stack,
                  std::string* err) {
    Image img;
    if (!decode_image(path.c_str(), &img, err)) return false;
    const int h_orig = img.h / 3;
    if (h_orig < 1 || img.w < 1) {
      *err = "bad stacked image dims: " + path;
      return false;
    }
    Axis ay, ax;
    build_axis(h_orig, th, &ay);
    build_axis(img.w, tw, &ax);
    stack->resize(sample_bytes);
    for (int part = 0; part < 3; ++part) {
      resize_bilinear_bgr(img.bgr.data() + (size_t)part * h_orig * img.w * 3,
                          h_orig, img.w,
                          stack->data() + (size_t)part * th * tw * 3, th, tw,
                          /*flip=*/false, ay, ax);
    }
    return true;
  }

  void run_job(const Job& job) {
    BatchSlot& bs = slots[job.ticket % ring];
    std::string err;
    std::vector<uint8_t> local;
    const std::vector<uint8_t>* stack = nullptr;
    {
      std::lock_guard<std::mutex> lk(cache_mu);
      auto it = cache.find(job.path);
      if (it != cache.end()) stack = &it->second;
    }
    if (!stack) {
      if (make_stack(job.path, &local, &err)) {
        stack = &local;
        if (cache_budget) {
          std::lock_guard<std::mutex> lk(cache_mu);
          if (cache_used + local.size() <= cache_budget &&
              !cache.count(job.path)) {
            cache_used += local.size();
            stack = &cache.emplace(job.path, local).first->second;
          }
        }
      }
    }
    if (stack) {
      uint8_t* dst = bs.buf.data() + (size_t)job.slot * sample_bytes;
      if (!job.flip) {
        memcpy(dst, stack->data(), sample_bytes);
      } else {  // whole-stack horizontal flip == per-row reversal of pixels
        const int rows = 3 * th;
        for (int y = 0; y < rows; ++y) {
          const uint8_t* s = stack->data() + (size_t)y * tw * 3;
          uint8_t* d = dst + (size_t)y * tw * 3;
          for (int x = 0; x < tw; ++x) {
            const uint8_t* sp = s + (size_t)(tw - 1 - x) * 3;
            d[x * 3 + 0] = sp[0];
            d[x * 3 + 1] = sp[1];
            d[x * 3 + 2] = sp[2];
          }
        }
      }
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      if (!stack) {
        bs.errmsg = err;
        bs.state = FAILED;
        last_error = err;
        cv_state.notify_all();
        return;
      }
      if (--bs.remaining == 0 && bs.state == PENDING) {
        bs.state = READY;
        cv_state.notify_all();
      }
    }
  }
};

}  // namespace

extern "C" {

void* kds_create(int n_threads, int ring, int batch, int th, int tw,
                 long cache_bytes) {
  if (n_threads < 1 || ring < 1 || batch < 1 || th < 1 || tw < 1)
    return nullptr;
  Service* s = new Service();
  s->batch = batch;
  s->th = th;
  s->tw = tw;
  s->ring = ring;
  s->sample_bytes = (size_t)3 * th * tw * 3;
  s->cache_budget = cache_bytes > 0 ? (size_t)cache_bytes : 0;
  s->slots.resize(ring);
  for (auto& b : s->slots) b.buf.resize(s->sample_bytes * batch);
  for (int i = 0; i < n_threads; ++i)
    s->workers.emplace_back([s] { s->worker_loop(); });
  return s;
}

// Submit batch `ticket` (tickets must be issued 0,1,2,... by the caller).
// Blocks until the ring slot ticket%ring is free. paths: batch C strings;
// flips: batch ints. Returns 0 on success.
int kds_submit(void* svc, int ticket, const char** paths, const int* flips) {
  Service* s = (Service*)svc;
  BatchSlot& bs = s->slots[ticket % s->ring];
  std::vector<Job> jobs(s->batch);
  for (int i = 0; i < s->batch; ++i)
    jobs[i] = Job{ticket, i, std::string(paths[i]), flips[i] != 0};
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv_state.wait(lk, [&] { return s->stopping || bs.state == FREE; });
    if (s->stopping) return -1;
    bs.state = PENDING;
    bs.ticket = ticket;
    bs.errmsg.clear();
    bs.remaining = s->batch;
    for (auto& j : jobs) s->jobs.push_back(std::move(j));
  }
  s->cv_jobs.notify_all();
  return 0;
}

// Block until batch `ticket` is decoded; returns the buffer ([batch,3*th,tw,3]
// uint8 BGR) or NULL on decode failure. Valid until kds_release(ticket).
const unsigned char* kds_wait(void* svc, int ticket) {
  Service* s = (Service*)svc;
  BatchSlot& bs = s->slots[ticket % s->ring];
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_state.wait(lk, [&] {
    return s->stopping || (bs.ticket == ticket &&
                           (bs.state == READY || bs.state == FAILED));
  });
  if (s->stopping || bs.state == FAILED) return nullptr;
  return bs.buf.data();
}

void kds_release(void* svc, int ticket) {
  Service* s = (Service*)svc;
  BatchSlot& bs = s->slots[ticket % s->ring];
  {
    std::lock_guard<std::mutex> lk(s->mu);
    if (bs.ticket == ticket && bs.state != PENDING) bs.state = FREE;
  }
  s->cv_state.notify_all();
}

void kds_destroy(void* svc) {
  Service* s = (Service*)svc;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->stopping = true;
  }
  s->cv_jobs.notify_all();
  s->cv_state.notify_all();
  for (auto& t : s->workers) t.join();
  delete s;
}

const char* kds_last_error(void* svc) {
  Service* s = (Service*)svc;
  std::lock_guard<std::mutex> lk(s->mu);
  return s->last_error.c_str();  // valid until next failure
}

// One-shot synchronous decode of a single stack (testing / simple callers):
// out must hold 3*th*tw*3 bytes. Returns 0 on success.
int kds_decode_one(const char* path, int th, int tw, int flip,
                   unsigned char* out) {
  Service tmp;
  tmp.th = th;
  tmp.tw = tw;
  tmp.sample_bytes = (size_t)3 * th * tw * 3;
  std::string err;
  std::vector<uint8_t> stack;
  if (!tmp.make_stack(path, &stack, &err)) {
    fprintf(stderr, "kds_decode_one: %s\n", err.c_str());
    return -1;
  }
  if (!flip) {
    memcpy(out, stack.data(), tmp.sample_bytes);
  } else {
    for (int y = 0; y < 3 * th; ++y) {
      const uint8_t* srow = stack.data() + (size_t)y * tw * 3;
      uint8_t* drow = out + (size_t)y * tw * 3;
      for (int x = 0; x < tw; ++x)
        memcpy(drow + x * 3, srow + (size_t)(tw - 1 - x) * 3, 3);
    }
  }
  return 0;
}

int kds_probe(const char* path, int* h, int* w) {
  std::string err;
  if (!probe_image(path, h, w, &err)) {
    fprintf(stderr, "kds_probe: %s\n", err.c_str());
    return -1;
  }
  return 0;
}

}  // extern "C"
