// Monotonic DTW for word-timestamp alignment (yoho_tpu/infer/word_timestamps.py).
//
// The pure-Python DP is ~670k iterations per 448x1500 window — host-bound
// at serving batch sizes. Mirrors the Python implementation EXACTLY
// (step set {(i+1,j), (i,j+1), (i+1,j+1)}, diagonal-preferring
// tie-breaks, identical backtrace), cross-checked in tests.

#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// cost: (n, m) row-major float32. Writes up to n+m entries into
// text_idx/time_idx (forward order). Returns the path length.
int yoho_dtw_path(const float* cost, int32_t n, int32_t m,
                  int32_t* text_idx, int32_t* time_idx) {
  const float INF = std::numeric_limits<float>::infinity();
  const int64_t W = m + 1;
  std::vector<float> acc((int64_t)(n + 1) * W, INF);
  std::vector<int8_t> trace((int64_t)(n + 1) * W, 0);
  acc[0] = 0.0f;
  for (int64_t i = 1; i <= n; ++i) {
    const float* row_c = cost + (i - 1) * m;
    float* acc_prev = acc.data() + (i - 1) * W;
    float* acc_cur = acc.data() + i * W;
    int8_t* tr = trace.data() + i * W;
    for (int64_t j = 1; j <= m; ++j) {
      const float c0 = acc_prev[j - 1];
      const float c1 = acc_prev[j];
      const float c2 = acc_cur[j - 1];
      float best;
      int8_t t;
      if (c0 <= c1 && c0 <= c2) {
        best = c0;
        t = 0;
      } else if (c1 <= c2) {
        best = c1;
        t = 1;
      } else {
        best = c2;
        t = 2;
      }
      acc_cur[j] = best + row_c[j - 1];
      tr[j] = t;
    }
  }

  // Backtrace (reversed), then flip into the output buffers.
  std::vector<int32_t> ti, fj;
  ti.reserve(n + m);
  fj.reserve(n + m);
  int64_t i = n, j = m;
  while (i > 0 || j > 0) {
    ti.push_back((int32_t)(i - 1));
    fj.push_back((int32_t)(j - 1));
    int8_t t;
    if (i > 0 && j > 0) {
      t = trace[i * W + j];
    } else if (i > 0) {
      t = 1;
    } else {
      t = 2;
    }
    if (t == 0) {
      --i;
      --j;
    } else if (t == 1) {
      --i;
    } else {
      --j;
    }
  }
  const int32_t len = (int32_t)ti.size();
  for (int32_t k = 0; k < len; ++k) {
    text_idx[k] = ti[len - 1 - k];
    time_idx[k] = fj[len - 1 - k];
  }
  return len;
}

}  // extern "C"
