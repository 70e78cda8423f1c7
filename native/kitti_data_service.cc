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

#if defined(__AVX2__)
#include <immintrin.h>
#endif

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
  // +4 slack: the AVX2 resize gathers a dword at the last pixel
  img->bgr.resize(PNG_IMAGE_SIZE(pi) + 4);
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
  // +4 slack: the AVX2 resize gathers a dword at the last pixel
  img->bgr.resize((size_t)img->h * img->w * 3 + 4);
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
  std::vector<int32_t> w0, w1;    // sum = 2048
  std::vector<int32_t> i0b, i1b;  // byte offsets (i*3) for the SIMD gathers
};

void build_axis(int src, int dst, Axis* ax) {
  // pad to the AVX2 lane width; padded entries replicate the last output
  // column (their stores land in padded row buffers, their gathers stay at
  // the final source pixel)
  const int dstv = (dst + 7) & ~7;
  ax->i0.resize(dstv);
  ax->i1.resize(dstv);
  ax->w0.resize(dstv);
  ax->w1.resize(dstv);
  ax->i0b.resize(dstv);
  ax->i1b.resize(dstv);
  const double scale = (double)src / dst;
  for (int x = 0; x < dstv; ++x) {
    double fx = ((x < dst ? x : dst - 1) + 0.5) * scale - 0.5;
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
    ax->i0b[x] = sx * 3;
    ax->i1b[x] = ax->i1[x] * 3;
  }
}

// src: [sh, sw, 3] BGR rows starting at src; dst: [dh, dw, 3] written left-to-
// right or right-to-left (flip) into dst_row pointers.
void resize_bilinear_bgr_scalar(const uint8_t* src, int sh, int sw,
                                uint8_t* dst, int dh, int dw, bool flip,
                                const Axis& ay, const Axis& ax) {
  (void)sh;
  // 2-slot cache of horizontally-filtered source rows: consecutive output
  // rows share a contributing source row whenever the vertical scale is
  // < 2x, so caching cuts the horizontal passes from 2/row to ~scale/row
  std::vector<int32_t> rowbuf[2] = {std::vector<int32_t>((size_t)dw * 3),
                                    std::vector<int32_t>((size_t)dw * 3)};
  int rowid[2] = {-1, -1};
  auto hpass = [&](int sy, int keep_sy) -> const int32_t* {
    for (int k = 0; k < 2; ++k)
      if (rowid[k] == sy) return rowbuf[k].data();
    const int slot = rowid[0] == keep_sy ? 1 : 0;  // never evict keep_sy
    const uint8_t* s = src + (size_t)sy * sw * 3;
    int32_t* r = rowbuf[slot].data();
    for (int x = 0; x < dw; ++x) {
      const int o0 = ax.i0[x] * 3, o1 = ax.i1[x] * 3;
      const int32_t w0 = ax.w0[x], w1 = ax.w1[x];
      for (int c = 0; c < 3; ++c)
        r[x * 3 + c] = w0 * s[o0 + c] + w1 * s[o1 + c];
    }
    rowid[slot] = sy;
    return r;
  };
  for (int y = 0; y < dh; ++y) {
    const int32_t* row0 = hpass(ay.i0[y], ay.i1[y]);
    const int32_t* row1 = hpass(ay.i1[y], ay.i0[y]);
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

#if defined(__AVX2__)
// AVX2 resize: identical fixed-point math to the scalar path (11-bit
// weights, +2^21 round, >>22), so outputs are bit-equal -- the parity tests
// (tests/test_native_loader.py) pin either path against the Python loader.
//
// Layout: per-channel PLANAR int32 row accumulators (the scalar path's
// interleaved rows defeat 8-lane loads). Horizontal taps come in as dword
// gathers at the pixel byte offset (decode buffers carry +4 slack so the
// last pixel's dword stays in bounds); a dword at offset i*3 holds the
// pixel's b,g,r in its low 3 bytes. The vertical blend is convex with
// 2048-sum weights, so wy0*r0 + wy1*r1 <= 2048 * (2048*255) < 2^31 and the
// whole pass stays in 32-bit lanes. Final interleave packs b|g<<8|r<<16 in
// SIMD and writes 3 bytes/pixel scalar (honoring flip).
void resize_bilinear_bgr_avx2(const uint8_t* src, int sh, int sw,
                              uint8_t* dst, int dh, int dw, bool flip,
                              const Axis& ay, const Axis& ax) {
  (void)sh;
  const int dwv = (dw + 7) & ~7;
  // 2-slot horizontal-row cache, planar [3][dwv] per slot (see the scalar
  // path for the sharing argument)
  std::vector<int32_t> rows(6 * (size_t)dwv);
  int32_t* slots[2][3] = {
      {rows.data(), rows.data() + dwv, rows.data() + 2 * dwv},
      {rows.data() + 3 * dwv, rows.data() + 4 * dwv, rows.data() + 5 * dwv}};
  int rowid[2] = {-1, -1};
  std::vector<uint32_t> pix(dwv);
  const __m256i mask255 = _mm256_set1_epi32(0xFF);
  const __m256i bias = _mm256_set1_epi32(1 << 21);
  auto hpass = [&](int sy, int keep_sy) -> int32_t* const* {
    for (int k = 0; k < 2; ++k)
      if (rowid[k] == sy) return slots[k];
    const int slot = rowid[0] == keep_sy ? 1 : 0;  // never evict keep_sy
    const uint8_t* s = src + (size_t)sy * sw * 3;
    int32_t* const* r = slots[slot];
    for (int x = 0; x < dw; x += 8) {
      const __m256i o0 = _mm256_loadu_si256((const __m256i*)&ax.i0b[x]);
      const __m256i o1 = _mm256_loadu_si256((const __m256i*)&ax.i1b[x]);
      const __m256i w0 = _mm256_loadu_si256((const __m256i*)&ax.w0[x]);
      const __m256i w1 = _mm256_loadu_si256((const __m256i*)&ax.w1[x]);
      const __m256i v0 = _mm256_i32gather_epi32((const int*)s, o0, 1);
      const __m256i v1 = _mm256_i32gather_epi32((const int*)s, o1, 1);
      for (int c = 0; c < 3; ++c) {
        const int shc = 8 * c;
        const __m256i p0 =
            _mm256_and_si256(_mm256_srli_epi32(v0, shc), mask255);
        const __m256i p1 =
            _mm256_and_si256(_mm256_srli_epi32(v1, shc), mask255);
        _mm256_storeu_si256(
            (__m256i*)&r[c][x],
            _mm256_add_epi32(_mm256_mullo_epi32(w0, p0),
                             _mm256_mullo_epi32(w1, p1)));
      }
    }
    rowid[slot] = sy;
    return r;
  };
  for (int y = 0; y < dh; ++y) {
    int32_t* const* r0 = hpass(ay.i0[y], ay.i1[y]);
    int32_t* const* r1 = hpass(ay.i1[y], ay.i0[y]);
    const __m256i wy0 = _mm256_set1_epi32(ay.w0[y]);
    const __m256i wy1 = _mm256_set1_epi32(ay.w1[y]);
    for (int x = 0; x < dw; x += 8) {
      __m256i acc[3];
      for (int c = 0; c < 3; ++c) {
        const __m256i a = _mm256_loadu_si256((const __m256i*)&r0[c][x]);
        const __m256i b = _mm256_loadu_si256((const __m256i*)&r1[c][x]);
        acc[c] = _mm256_srli_epi32(
            _mm256_add_epi32(
                _mm256_add_epi32(_mm256_mullo_epi32(wy0, a),
                                 _mm256_mullo_epi32(wy1, b)),
                bias),
            22);
      }
      _mm256_storeu_si256(
          (__m256i*)&pix[x],
          _mm256_or_si256(acc[0],
                          _mm256_or_si256(_mm256_slli_epi32(acc[1], 8),
                                          _mm256_slli_epi32(acc[2], 16))));
    }
    uint8_t* d = dst + (size_t)y * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint32_t v = pix[x];
      const int xo = flip ? (dw - 1 - x) * 3 : x * 3;
      d[xo] = (uint8_t)v;
      d[xo + 1] = (uint8_t)(v >> 8);
      d[xo + 2] = (uint8_t)(v >> 16);
    }
  }
}
#endif  // __AVX2__

// 1 = force the scalar path (kds_set_scalar / KDS_NO_AVX2); the in-process
// toggle exists so tests and the resize bench can A/B both paths.
int g_force_scalar = -1;  // -1 = uninitialized (read KDS_NO_AVX2 once)

bool use_avx2() {
#if defined(__AVX2__)
  if (g_force_scalar < 0) g_force_scalar = getenv("KDS_NO_AVX2") ? 1 : 0;
  return !g_force_scalar && __builtin_cpu_supports("avx2");
#else
  return false;
#endif
}

void resize_bilinear_bgr(const uint8_t* src, int sh, int sw, uint8_t* dst,
                         int dh, int dw, bool flip, const Axis& ay,
                         const Axis& ax) {
#if defined(__AVX2__)
  if (use_avx2())
    return resize_bilinear_bgr_avx2(src, sh, sw, dst, dh, dw, flip, ay, ax);
#endif
  resize_bilinear_bgr_scalar(src, sh, sw, dst, dh, dw, flip, ay, ax);
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

// Force (1) / un-force (0) the scalar resize path; returns the previous
// setting. Lets tests and the bench A/B scalar vs AVX2 in one process.
int kds_set_scalar(int force) {
  int prev = g_force_scalar > 0 ? 1 : 0;
  g_force_scalar = force ? 1 : 0;
  return prev;
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
