// Linear sum assignment (Hungarian algorithm with dual potentials).
//
// Native replacement for the reference's scipy.optimize.linear_sum_assignment
// call in the semantic style-matching step (/root/reference/loss.py:169-184).
// The assignment runs once per stylization run on host, matching render
// classes to style segmentation clusters; keeping it native removes the scipy
// dependency from the serving path.
//
// Classic O(n^2 * m) shortest-augmenting-path formulation with row/column
// potentials (Kuhn-Munkres as popularized by e-maxx).  Rectangular costs with
// n_rows <= n_cols; the Python wrapper transposes otherwise and sanitizes
// non-finite entries.
//
// C ABI for ctypes binding (see nerfstyle_tpu/losses/assignment.py).

#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// cost: row-major [n_rows, n_cols], n_rows <= n_cols, all entries finite.
// row_to_col: output [n_rows] — assigned column per row.
// Returns 0 on success, -1 on invalid input.
int nerfstyle_lsa(const double* cost, int32_t n_rows, int32_t n_cols,
                  int32_t* row_to_col) {
  if (n_rows <= 0 || n_cols <= 0 || n_rows > n_cols) return -1;
  const int n = n_rows, m = n_cols;
  const double INF = std::numeric_limits<double>::infinity();

  // 1-indexed arrays; p[j] = row matched to column j (0 = none).
  std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
  std::vector<int> p(m + 1, 0), way(m + 1, 0);

  for (int i = 1; i <= n; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(m + 1, INF);
    std::vector<char> used(m + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = 0;
      double delta = INF;
      for (int j = 1; j <= m; ++j) {
        if (used[j]) continue;
        double cur = cost[(size_t)(i0 - 1) * m + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      if (j1 == 0) return -1;  // no finite augmenting edge
      for (int j = 0; j <= m; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    // Augment: flip the alternating path.
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != 0);
  }

  for (int j = 1; j <= m; ++j) {
    if (p[j] != 0) row_to_col[p[j] - 1] = j - 1;
  }
  return 0;
}

}  // extern "C"
