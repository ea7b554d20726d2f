/* Parlett–Reinsch diagonal similarity balancing — native equivalent of the
 * reference's numba-JIT'd routine (pssgp/kernels/math_utils.py:10-29; method
 * of arXiv 1401.5766).  Semantics match parallel_gps_tpu/ops/balance.py's
 * balance_scale exactly, including the degenerate-row/column guard.
 *
 * Build: make -C native  (produces libpgpsbalance.so, loaded via ctypes).
 */
#include <math.h>

/* F: row-major n*n (modified in place as scratch); d_out: length n. */
void pgps_balance_scale(double *F, int n, int iters, double *d_out) {
  for (int i = 0; i < n; ++i) d_out[i] = 1.0;
  for (int it = 0; it < iters; ++it) {
    for (int i = 0; i < n; ++i) {
      double c = 0.0, r = 0.0;
      for (int k = 0; k < n; ++k) {
        if (k != i) {
          c += F[k * n + i] * F[k * n + i];
          r += F[i * n + k] * F[i * n + k];
        }
      }
      c = sqrt(c);
      r = sqrt(r);
      if (c > 0.0 && r > 0.0) {
        double f = sqrt(r / c);
        d_out[i] *= f;
        for (int k = 0; k < n; ++k) F[k * n + i] *= f;
        for (int k = 0; k < n; ++k) F[i * n + k] /= f;
      }
    }
  }
}
