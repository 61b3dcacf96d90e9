// iqstream — native IQ sample ingest for the TPU tracking framework.
//
// The reference generates synthetic signals on-device and has no IO path at
// all (SURVEY.md §1: no data loader anywhere in /root/reference/src). A
// production receiver front-end, however, delivers interleaved fixed-point
// IQ at tens of MS/s; decoding and de-interleaving that stream in Python is
// orders of magnitude too slow to feed the correlator. This library is the
// framework's native data-loader: it decodes front-end sample formats
// (interleaved int8 / int16 / float32 complex) into the structure-of-arrays
// float32 planes the kernels consume (the SoA layout decision of
// /root/reference/src/gen_signal.jl:181-184, kept on TPU), with a lock-free
// single-producer/single-consumer ring buffer for real-time streaming.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Block decoding: interleaved complex -> SoA float planes
// ---------------------------------------------------------------------------

// Formats: 0 = int8, 1 = int16, 2 = float32 (all interleaved I,Q,I,Q,...)
int iq_decode(const void* src, int format, int64_t num_samples, float scale,
              float* out_re, float* out_im) {
  if (!src || !out_re || !out_im || num_samples < 0) return -1;
  switch (format) {
    case 0: {
      const int8_t* s = static_cast<const int8_t*>(src);
      for (int64_t n = 0; n < num_samples; ++n) {
        out_re[n] = scale * static_cast<float>(s[2 * n]);
        out_im[n] = scale * static_cast<float>(s[2 * n + 1]);
      }
      return 0;
    }
    case 1: {
      const int16_t* s = static_cast<const int16_t*>(src);
      for (int64_t n = 0; n < num_samples; ++n) {
        out_re[n] = scale * static_cast<float>(s[2 * n]);
        out_im[n] = scale * static_cast<float>(s[2 * n + 1]);
      }
      return 0;
    }
    case 2: {
      const float* s = static_cast<const float*>(src);
      for (int64_t n = 0; n < num_samples; ++n) {
        out_re[n] = scale * s[2 * n];
        out_im[n] = scale * s[2 * n + 1];
      }
      return 0;
    }
    default:
      return -2;
  }
}

// ---------------------------------------------------------------------------
// File reader
// ---------------------------------------------------------------------------

struct IqFile {
  FILE* f;
  int format;        // 0/1/2 as above
  int bytes_per_iq;  // bytes per complex sample
};

void* iqfile_open(const char* path, int format) {
  int bytes;
  switch (format) {
    case 0: bytes = 2; break;
    case 1: bytes = 4; break;
    case 2: bytes = 8; break;
    default: return nullptr;
  }
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  IqFile* h = new IqFile{f, format, bytes};
  return h;
}

// Reads up to num_samples complex samples into SoA planes; returns the
// number of samples actually read (short at EOF), or -1 on error.
int64_t iqfile_read(void* handle, int64_t num_samples, float scale,
                    float* out_re, float* out_im) {
  IqFile* h = static_cast<IqFile*>(handle);
  if (!h || num_samples < 0) return -1;
  const int64_t buf_samples = 1 << 16;
  int64_t done = 0;
  char* buf = static_cast<char*>(
      std::malloc(static_cast<size_t>(buf_samples) * h->bytes_per_iq));
  if (!buf) return -1;
  while (done < num_samples) {
    int64_t want = num_samples - done;
    if (want > buf_samples) want = buf_samples;
    size_t got = std::fread(buf, h->bytes_per_iq, static_cast<size_t>(want),
                            h->f);
    if (got == 0) break;
    iq_decode(buf, h->format, static_cast<int64_t>(got), scale,
              out_re + done, out_im + done);
    done += static_cast<int64_t>(got);
  }
  std::free(buf);
  return done;
}

int64_t iqfile_num_samples(void* handle) {
  IqFile* h = static_cast<IqFile*>(handle);
  if (!h) return -1;
  long pos = std::ftell(h->f);
  if (std::fseek(h->f, 0, SEEK_END) != 0) return -1;
  long end = std::ftell(h->f);
  std::fseek(h->f, pos, SEEK_SET);
  return end / h->bytes_per_iq;
}

void iqfile_close(void* handle) {
  IqFile* h = static_cast<IqFile*>(handle);
  if (!h) return;
  std::fclose(h->f);
  delete h;
}

// ---------------------------------------------------------------------------
// Lock-free SPSC ring buffer of SoA float sample pairs (streaming front-end)
// ---------------------------------------------------------------------------

struct IqRing {
  float* re;
  float* im;
  int64_t capacity;                 // in samples
  std::atomic<int64_t> head;        // write position (monotonic)
  std::atomic<int64_t> tail;        // read position (monotonic)
};

void* iqring_create(int64_t capacity) {
  if (capacity <= 0) return nullptr;
  IqRing* r = new IqRing;
  r->re = static_cast<float*>(std::malloc(sizeof(float) * capacity));
  r->im = static_cast<float*>(std::malloc(sizeof(float) * capacity));
  if (!r->re || !r->im) {
    std::free(r->re);
    std::free(r->im);
    delete r;
    return nullptr;
  }
  r->capacity = capacity;
  r->head.store(0);
  r->tail.store(0);
  return r;
}

int64_t iqring_size(void* handle) {
  IqRing* r = static_cast<IqRing*>(handle);
  if (!r) return -1;
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

// Producer: push decoded samples; returns pushed count (< num if full).
int64_t iqring_push(void* handle, const float* re, const float* im,
                    int64_t num) {
  IqRing* r = static_cast<IqRing*>(handle);
  if (!r || num < 0) return -1;
  int64_t head = r->head.load(std::memory_order_relaxed);
  int64_t tail = r->tail.load(std::memory_order_acquire);
  int64_t space = r->capacity - (head - tail);
  if (num > space) num = space;
  for (int64_t n = 0; n < num; ++n) {
    int64_t idx = (head + n) % r->capacity;
    r->re[idx] = re[n];
    r->im[idx] = im[n];
  }
  r->head.store(head + num, std::memory_order_release);
  return num;
}

// Consumer: pop exactly num samples into contiguous SoA planes, or 0 if not
// enough buffered yet (all-or-nothing: a correlator block must be complete).
int64_t iqring_pop_block(void* handle, float* out_re, float* out_im,
                         int64_t num) {
  IqRing* r = static_cast<IqRing*>(handle);
  if (!r || num < 0) return -1;
  int64_t head = r->head.load(std::memory_order_acquire);
  int64_t tail = r->tail.load(std::memory_order_relaxed);
  if (head - tail < num) return 0;
  for (int64_t n = 0; n < num; ++n) {
    int64_t idx = (tail + n) % r->capacity;
    out_re[n] = r->re[idx];
    out_im[n] = r->im[idx];
  }
  r->tail.store(tail + num, std::memory_order_release);
  return num;
}

void iqring_destroy(void* handle) {
  IqRing* r = static_cast<IqRing*>(handle);
  if (!r) return;
  std::free(r->re);
  std::free(r->im);
  delete r;
}

}  // extern "C"
