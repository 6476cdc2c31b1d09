// Native batch loader for WSI feature bags.
//
// The training input is bags of patch features stored one file per slide
// (.npy float32/float16, shape (N, D)); a bag can reach 50k x 1024 floats
// (~200 MB).  The Python engine pads bags into bucketed batches before
// device transfer (rrtmil_tpu/train/engine.py _make_batch); this module
// moves the read + cast + pad + mask assembly into multithreaded C++ so
// host IO overlaps TPU compute instead of serializing on the GIL.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image):
//
//   int bag_fill_batch(const char** paths, int n_bags,
//                      float* out,        // (n_bags, rows_out, cols)
//                      unsigned char* mask,  // (n_bags, rows_out)
//                      long long rows_out, long long cols,
//                      long long* true_rows, // out: per-bag N (clamped)
//                      int n_threads);
//
// Returns 0 on success, else the (1-based) index of the first failing bag.
// The reference has no native code at all (SURVEY.md "headline facts");
// this is the framework's IO runtime, not a port.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Minimal .npy parser: v1.0/v2.0 header, C-order, 2-D, <f4 or <f2.
struct NpyInfo {
  long long rows = 0, cols = 0;
  bool fp16 = false;
  long long data_offset = 0;
};

bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  unsigned int header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    header_len = b[0] | (b[1] << 8);
    info->data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((unsigned)b[3] << 24);
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  if (header.find("'fortran_order': True") != std::string::npos) return false;
  size_t dt = header.find("'descr':");
  if (dt == std::string::npos) return false;
  if (header.find("<f4", dt) != std::string::npos) info->fp16 = false;
  else if (header.find("<f2", dt) != std::string::npos) info->fp16 = true;
  else return false;

  size_t sh = header.find("'shape':");
  if (sh == std::string::npos) return false;
  size_t open = header.find('(', sh);
  if (open == std::string::npos) return false;
  long long rows = 0, cols = 1;
  if (sscanf(header.c_str() + open, "(%lld, %lld", &rows, &cols) < 1)
    return false;
  info->rows = rows;
  info->cols = cols;
  return true;
}

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t frac = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (frac == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while ((frac & 0x400) == 0) { frac <<= 1; exp--; }
      frac &= 0x3ff;
      bits = sign | (exp << 23) | (frac << 13);
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000u | (frac << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (frac << 13);
  }
  float out;
  memcpy(&out, &bits, sizeof(out));
  return out;
}

// fp32 -> bf16 with round-to-nearest-even (ml_dtypes-compatible for
// finite values; NaNs are quieted rather than rounded into Inf).
inline uint16_t float_to_bf16(float f) {
  uint32_t u;
  memcpy(&u, &f, sizeof(u));
  if ((u & 0x7f800000u) == 0x7f800000u && (u & 0x007fffffu) != 0)
    return (uint16_t)((u >> 16) | 0x0040);  // NaN: keep quiet
  uint32_t rounded = u + 0x7fffu + ((u >> 16) & 1u);
  return (uint16_t)(rounded >> 16);
}

// Streaming loader for bf16 output: reads the payload in ~2 MB chunks into
// a stack staging buffer and converts fp32/fp16 -> bf16 in place, so the
// (B, rows, cols) output is written once in the transfer dtype and the
// Python-side numpy astype pass (163 ms/batch single-threaded at the
// batch-8 flagship shape) disappears entirely.
bool load_one_bf16(const char* path, uint16_t* out, unsigned char* mask,
                   long long rows_out, long long cols,
                   long long* true_rows) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  NpyInfo info;
  if (!parse_npy_header(f, &info) || info.cols != cols) {
    fclose(f);
    return false;
  }
  long long n = info.rows < rows_out ? info.rows : rows_out;
  *true_rows = n;
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0) {
    fclose(f);
    return false;
  }
  const size_t kChunk = 1 << 19;  // elements per read (2 MB fp32)
  size_t want = (size_t)(n * cols);
  std::vector<uint32_t> buf(kChunk);
  size_t done = 0;
  while (done < want) {
    size_t take = want - done < kChunk ? want - done : kChunk;
    if (!info.fp16) {
      if (fread(buf.data(), sizeof(float), take, f) != take) {
        fclose(f);
        return false;
      }
      const float* src = reinterpret_cast<const float*>(buf.data());
      for (size_t i = 0; i < take; ++i) out[done + i] = float_to_bf16(src[i]);
    } else {
      uint16_t* half = reinterpret_cast<uint16_t*>(buf.data());
      if (fread(half, sizeof(uint16_t), take, f) != take) {
        fclose(f);
        return false;
      }
      for (size_t i = 0; i < take; ++i)
        out[done + i] = float_to_bf16(half_to_float(half[i]));
    }
    done += take;
  }
  fclose(f);
  memset(out + want, 0, (size_t)((rows_out - n) * cols) * sizeof(uint16_t));
  memset(mask, 1, (size_t)n);
  memset(mask + n, 0, (size_t)(rows_out - n));
  return true;
}

bool load_one(const char* path, float* out, unsigned char* mask,
              long long rows_out, long long cols, long long* true_rows) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  NpyInfo info;
  if (!parse_npy_header(f, &info) || info.cols != cols) {
    fclose(f);
    return false;
  }
  long long n = info.rows < rows_out ? info.rows : rows_out;
  *true_rows = n;
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0) {
    fclose(f);
    return false;
  }
  if (!info.fp16) {
    size_t want = (size_t)(n * cols);
    if (fread(out, sizeof(float), want, f) != want) {
      fclose(f);
      return false;
    }
  } else {
    std::vector<uint16_t> buf((size_t)(n * cols));
    if (fread(buf.data(), sizeof(uint16_t), buf.size(), f) != buf.size()) {
      fclose(f);
      return false;
    }
    for (size_t i = 0; i < buf.size(); ++i) out[i] = half_to_float(buf[i]);
  }
  fclose(f);
  // zero-pad the tail, fill mask
  memset(out + n * cols, 0, (size_t)((rows_out - n) * cols) * sizeof(float));
  memset(mask, 1, (size_t)n);
  memset(mask + n, 0, (size_t)(rows_out - n));
  return true;
}

}  // namespace

namespace {

template <typename T, typename LoadFn>
int fill_batch_impl(const char** paths, int n_bags, T* out,
                    unsigned char* mask, long long rows_out, long long cols,
                    long long* true_rows, int n_threads, LoadFn load_fn) {
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  int workers = n_threads < 1 ? 1 : n_threads;
  if (workers > n_bags) workers = n_bags;

  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_bags || failed.load() != 0) return;
      T* dst = out + (long long)i * rows_out * cols;
      unsigned char* mdst = mask + (long long)i * rows_out;
      if (!load_fn(paths[i], dst, mdst, rows_out, cols, &true_rows[i])) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < workers; ++t) threads.emplace_back(work);
  for (auto& th : threads) th.join();
  return failed.load();
}

}  // namespace

extern "C" {

int bag_fill_batch(const char** paths, int n_bags, float* out,
                   unsigned char* mask, long long rows_out, long long cols,
                   long long* true_rows, int n_threads) {
  return fill_batch_impl(paths, n_bags, out, mask, rows_out, cols,
                         true_rows, n_threads, load_one);
}

// Same contract, but the batch is emitted as bf16 (uint16 payload): the
// transfer dtype for --amp training, written directly by the loader
// threads so no host-side cast pass exists and H2D moves half the bytes.
int bag_fill_batch_bf16(const char** paths, int n_bags, uint16_t* out,
                        unsigned char* mask, long long rows_out,
                        long long cols, long long* true_rows,
                        int n_threads) {
  return fill_batch_impl(paths, n_bags, out, mask, rows_out, cols,
                         true_rows, n_threads, load_one_bf16);
}

// Single-bag header probe: returns rows (or -1) so the engine can bucket
// without loading the payload.
long long bag_num_rows(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  bool ok = parse_npy_header(f, &info);
  fclose(f);
  return ok ? info.rows : -1;
}

}  // extern "C"
