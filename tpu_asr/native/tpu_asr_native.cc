// Native runtime pieces for tpu-asr (C++17, built with g++ -O3 at import).
//
// The reference stack's native code is third-party: Kaldi's C++ feature/ark
// tools, the C-backed `kaldi_io` ark parser in its DataLoader, and sctk/
// sclite for scoring (SURVEY.md section 2.2). These are their first-party
// equivalents, serving the host-side runtime around the JAX compute path:
//
//   ark_mat_shape / ark_mat_read   binary Kaldi ark matrix parsing
//   pad_batch_f32                  threaded collate: ragged rows -> padded
//   batch_edit_distance            threaded Levenshtein CER/WER scoring
//
// Exposed over a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// ---------- Kaldi binary ark matrix ----------

// Returns 0 on success. kind: 4 = float32, 8 = float64 (itemsize).
int ark_mat_shape(const char* path, int64_t offset, int32_t* rows,
                  int32_t* cols, int32_t* itemsize) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  if (std::fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    std::fclose(f);
    return 2;
  }
  unsigned char hdr[5];
  if (std::fread(hdr, 1, 5, f) != 5 || hdr[0] != 0x00 || hdr[1] != 'B') {
    std::fclose(f);
    return 3;
  }
  if (hdr[2] == 'F' && hdr[3] == 'M' && hdr[4] == ' ') *itemsize = 4;
  else if (hdr[2] == 'D' && hdr[3] == 'M' && hdr[4] == ' ') *itemsize = 8;
  else { std::fclose(f); return 4; }
  unsigned char szb;
  int32_t dims[2];
  for (int i = 0; i < 2; ++i) {
    if (std::fread(&szb, 1, 1, f) != 1 || szb != 4) { std::fclose(f); return 5; }
    if (std::fread(&dims[i], 4, 1, f) != 1) { std::fclose(f); return 6; }
  }
  *rows = dims[0];
  *cols = dims[1];
  std::fclose(f);
  return 0;
}

// out must hold rows*cols floats; doubles are converted.
int ark_mat_read(const char* path, int64_t offset, float* out) {
  int32_t rows, cols, itemsize;
  int rc = ark_mat_shape(path, offset, &rows, &cols, &itemsize);
  if (rc != 0) return rc;
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  // header: 2 (\0B) + 3 (kind) + 2*(1+4) bytes
  std::fseek(f, static_cast<long>(offset) + 5 + 10, SEEK_SET);
  size_t n = static_cast<size_t>(rows) * cols;
  if (itemsize == 4) {
    if (std::fread(out, 4, n, f) != n) { std::fclose(f); return 7; }
  } else {
    std::vector<double> buf(n);
    if (std::fread(buf.data(), 8, n, f) != n) { std::fclose(f); return 7; }
    for (size_t i = 0; i < n; ++i) out[i] = static_cast<float>(buf[i]);
  }
  std::fclose(f);
  return 0;
}

// ---------- collate: ragged float rows -> zero-padded batch ----------

// srcs: n pointers; lens: rows per source; width: row width (features);
// out: [n, max_rows, width] zero-initialized by caller or here.
void pad_batch_f32(const float** srcs, const int32_t* lens, int32_t n,
                   int32_t max_rows, int32_t width, float* out) {
  std::memset(out, 0,
              static_cast<size_t>(n) * max_rows * width * sizeof(float));
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = std::max(1, std::min(hw, n));
  std::vector<std::thread> ts;
  ts.reserve(n_threads);
  for (int ti = 0; ti < n_threads; ++ti) {
    ts.emplace_back([=]() {
      for (int i = ti; i < n; i += n_threads) {
        size_t count = static_cast<size_t>(lens[i]) * width;
        std::memcpy(out + static_cast<size_t>(i) * max_rows * width,
                    srcs[i], count * sizeof(float));
      }
    });
  }
  for (auto& t : ts) t.join();
}

// ---------- Levenshtein with sub/ins/del breakdown ----------

static void edit_one(const int32_t* ref, int32_t rn, const int32_t* hyp,
                     int32_t hn, int64_t* out4) {
  // dp over (cost, sub, ins, del); row-major over hyp prefix
  struct Cell { int32_t c, s, i, d; };
  std::vector<Cell> prev(hn + 1), cur(hn + 1);
  for (int32_t j = 0; j <= hn; ++j) prev[j] = {j, 0, j, 0};
  for (int32_t i = 1; i <= rn; ++i) {
    cur[0] = {i, 0, 0, i};
    for (int32_t j = 1; j <= hn; ++j) {
      if (ref[i - 1] == hyp[j - 1]) {
        cur[j] = prev[j - 1];
      } else {
        const Cell& sub = prev[j - 1];
        const Cell& ins = cur[j - 1];
        const Cell& del = prev[j];
        if (sub.c <= ins.c && sub.c <= del.c)
          cur[j] = {sub.c + 1, sub.s + 1, sub.i, sub.d};
        else if (ins.c <= del.c)
          cur[j] = {ins.c + 1, ins.s, ins.i + 1, ins.d};
        else
          cur[j] = {del.c + 1, del.s, del.i, del.d + 1};
      }
    }
    std::swap(prev, cur);
  }
  out4[0] = prev[hn].c;
  out4[1] = prev[hn].s;
  out4[2] = prev[hn].i;
  out4[3] = prev[hn].d;
}

// refs/hyps: concatenated id sequences with per-pair offsets.
// out: [n, 4] (distance, sub, ins, del)
void batch_edit_distance(const int32_t* refs, const int64_t* ref_offsets,
                         const int32_t* ref_lens, const int32_t* hyps,
                         const int64_t* hyp_offsets, const int32_t* hyp_lens,
                         int32_t n, int64_t* out) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = std::max(1, std::min(hw, n));
  std::vector<std::thread> ts;
  ts.reserve(n_threads);
  for (int ti = 0; ti < n_threads; ++ti) {
    ts.emplace_back([=]() {
      for (int i = ti; i < n; i += n_threads) {
        edit_one(refs + ref_offsets[i], ref_lens[i],
                 hyps + hyp_offsets[i], hyp_lens[i], out + 4 * i);
      }
    });
  }
  for (auto& t : ts) t.join();
}

}  // extern "C"
