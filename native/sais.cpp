// SA-IS suffix array construction (linear time, induced sorting).
//
// Replaces the reference's Larsson-Sadakane qsufsort + incremental BWT
// build (2bwt-lib/QSufSort.c:53, BWTConstruct.c:113) for the offline
// index builder: SA-IS is O(n) and a single pass over flat arrays, so
// a whole-genome suffix array builds in minutes on one core.
//
// Exposed C ABI (loaded from Python via ctypes):
//   int sais_u8(const uint8_t* t, int64_t n, int64_t* sa)
// computes the suffix array of t[0..n) over alphabet {0..255} with the
// usual virtual-sentinel convention (suffix end-of-string < any char),
// writing n entries to sa. Returns 0 on success.
//
// Template on the index type: int32 recursion levels for n < 2^31
// (covers every genome the 4Gbp format limit allows at the top level
// only via int64; recursion strings shrink, so deeper levels switch to
// int32 automatically when they fit).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename I>
struct Sais {
  // T: values in [0, K); SA: output, length n.
  template <typename Char>
  static int run(const Char* T, I n, I K, I* SA) {
    if (n == 0) return 0;
    if (n == 1) { SA[0] = 0; return 0; }

    std::vector<uint8_t> ls((size_t)n);  // 1 = S-type, 0 = L-type
    ls[n - 1] = 0;  // last real char is L-type (> virtual sentinel)
    for (I i = n - 2; i >= 0; --i)
      ls[(size_t)i] = (T[i] < T[i + 1] || (T[i] == T[i + 1] && ls[(size_t)i + 1])) ? 1 : 0;

    auto is_lms = [&](I i) { return i > 0 && ls[(size_t)i] && !ls[(size_t)i - 1]; };

    std::vector<I> cnt((size_t)K, 0), head((size_t)K), tail((size_t)K);
    for (I i = 0; i < n; ++i) cnt[(size_t)T[i]]++;
    auto reset_heads = [&]() {
      I s = 0;
      for (I c = 0; c < K; ++c) { head[(size_t)c] = s; s += cnt[(size_t)c]; }
    };
    auto reset_tails = [&]() {
      I s = 0;
      for (I c = 0; c < K; ++c) { s += cnt[(size_t)c]; tail[(size_t)c] = s; }
    };

    auto induce = [&](const std::vector<I>& lms, bool final_pass) {
      (void)final_pass;
      for (I i = 0; i < n; ++i) SA[i] = (I)-1;
      // place LMS suffixes at bucket tails, in the given order reversed
      reset_tails();
      for (size_t k = lms.size(); k-- > 0;) {
        I j = lms[k];
        SA[--tail[(size_t)T[j]]] = j;
      }
      // induce L-types left-to-right; virtual sentinel first
      reset_heads();
      {
        I j = n - 1;  // suffix preceding the sentinel
        if (!ls[(size_t)j]) SA[head[(size_t)T[j]]++] = j;
      }
      for (I i = 0; i < n; ++i) {
        I j = SA[i];
        if (j > 0 && !ls[(size_t)j - 1]) SA[head[(size_t)T[j - 1]]++] = j - 1;
      }
      // induce S-types right-to-left
      reset_tails();
      for (I i = n - 1; i >= 0; --i) {
        I j = SA[i];
        if (j > 0 && ls[(size_t)j - 1]) SA[--tail[(size_t)T[j - 1]]] = j - 1;
      }
    };

    // collect LMS positions in text order
    std::vector<I> lms;
    for (I i = 1; i < n; ++i)
      if (is_lms(i)) lms.push_back(i);
    I nlms = (I)lms.size();
    if (nlms == 0) {
      // strictly decreasing text: SA is reverse identity by induction
      induce(lms, true);
      return 0;
    }

    induce(lms, false);

    // name LMS substrings in SA order
    std::vector<I> name((size_t)n, (I)-1);
    I names = 0;
    I prev = -1;
    for (I i = 0; i < n; ++i) {
      I j = SA[i];
      if (j <= 0 || !is_lms(j)) continue;
      if (prev < 0) {
        name[(size_t)j] = names++;
      } else {
        // compare LMS substrings at prev and j
        bool same = true;
        for (I d = 0;; ++d) {
          I a = prev + d, b = j + d;
          bool ea = a >= n, eb = b >= n;
          if (ea || eb) { same = ea && eb; break; }
          if (T[a] != T[b] || ls[(size_t)a] != ls[(size_t)b]) { same = false; break; }
          if (d > 0 && (is_lms(a) || is_lms(b))) { same = is_lms(a) && is_lms(b); break; }
        }
        if (!same) ++names;
        name[(size_t)j] = names - 1;
      }
      prev = j;
    }

    // reduced problem: names of LMS substrings in text order
    std::vector<I> red((size_t)nlms);
    for (I k = 0; k < nlms; ++k) red[(size_t)k] = name[(size_t)lms[(size_t)k]];

    std::vector<I> sa1((size_t)nlms);
    if (names < nlms) {
      int rc = run<I>(red.data(), nlms, names, sa1.data());
      if (rc) return rc;
    } else {
      for (I k = 0; k < nlms; ++k) sa1[(size_t)red[(size_t)k]] = k;
    }

    // final induce with LMS suffixes in sorted order
    std::vector<I> sorted_lms((size_t)nlms);
    for (I k = 0; k < nlms; ++k) sorted_lms[(size_t)k] = lms[(size_t)sa1[(size_t)k]];
    induce(sorted_lms, true);
    return 0;
  }
};

}  // namespace

extern "C" {

int sais_u8(const uint8_t* t, int64_t n, int64_t* sa) {
  if (n < 0) return 1;
  if (n < (int64_t)1 << 31) {
    std::vector<int32_t> sa32((size_t)n);
    int rc = Sais<int32_t>::run(t, (int32_t)n, (int32_t)256, sa32.data());
    if (rc) return rc;
    for (int64_t i = 0; i < n; ++i) sa[i] = sa32[(size_t)i];
    return 0;
  }
  return Sais<int64_t>::run(t, n, (int64_t)256, sa);
}

}  // extern "C"
