// Native (host, f64) conic interior-point solver.
//
// This is the framework's native counterpart of the ECOS C solver that the
// reference links against (SCPToolbox.jl Project.toml:11,
// src/parser/general.jl:22): a dense homogeneous-self-dual-embedding (HSDE)
// Mehrotra predictor-corrector primal-dual IPM over the product cone
//   K = {0}^nz x R+^nl x SOC(d_1) x ... x SOC(d_k),
// solving  min c'x  s.t.  Ax + s = b, s in K.
//
// It mirrors the math of the TPU-path JAX solver (scptoolbox_tpu/ops/ipm.py)
// — same NT scaling, same reduced Schur KKT with iterative refinement, same
// residual/certificate tests — so the two backends cross-check each other in
// the test suite, and the host backend serves small problems (e.g. scaling
// LPs, host-side golden-search inner solves) without a device round trip.
//
// Dense, dependency-free C++17. Not a translation of ECOS: the algorithm is
// the standard conelp HSDE method; the implementation is original.
//
// Build: g++ -O3 -march=native -fPIC -shared ipm.cpp -o libscptipm.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

using std::size_t;
using vec = std::vector<double>;

constexpr double kBig = 1e308;

struct ConeSpec {
  int nz = 0;                 // leading equality rows
  int nl = 0;                 // nonneg rows
  std::vector<int> socs;      // SOC block dims (each >= 2)
  int m() const {
    int t = nz + nl;
    for (int d : socs) t += d;
    return t;
  }
  int degree() const { return nl + static_cast<int>(socs.size()); }
};

// ------------------------------ cone algebra ------------------------------
// Layout of an m-vector: [zero | nonneg | soc_1 | ... | soc_k].

void cone_product(const ConeSpec& K, const double* u, const double* v,
                  double* out) {
  std::memset(out, 0, sizeof(double) * K.nz);
  for (int i = K.nz; i < K.nz + K.nl; ++i) out[i] = u[i] * v[i];
  int off = K.nz + K.nl;
  for (int d : K.socs) {
    double head = 0;
    for (int i = 0; i < d; ++i) head += u[off + i] * v[off + i];
    for (int i = 1; i < d; ++i)
      out[off + i] = u[off] * v[off + i] + v[off] * u[off + i];
    out[off] = head;
    off += d;
  }
}

void cone_div(const ConeSpec& K, const double* lam, const double* v,
              double* out) {
  std::memset(out, 0, sizeof(double) * K.nz);
  for (int i = K.nz; i < K.nz + K.nl; ++i) out[i] = v[i] / lam[i];
  int off = K.nz + K.nl;
  for (int d : K.socs) {
    const double l0 = lam[off];
    double l1v1 = 0, l1sq = 0;
    for (int i = 1; i < d; ++i) {
      l1v1 += lam[off + i] * v[off + i];
      l1sq += lam[off + i] * lam[off + i];
    }
    const double det = l0 * l0 - l1sq;
    const double x0 = (l0 * v[off] - l1v1) / det;
    out[off] = x0;
    for (int i = 1; i < d; ++i) out[off + i] = (v[off + i] - x0 * lam[off + i]) / l0;
    off += d;
  }
}

// largest alpha >= 0 with u + alpha du in K (u strictly interior)
double max_step(const ConeSpec& K, const double* u, const double* du) {
  double alpha = kBig;
  for (int i = K.nz; i < K.nz + K.nl; ++i)
    if (du[i] < 0) alpha = std::min(alpha, -u[i] / du[i]);
  int off = K.nz + K.nl;
  for (int d : K.socs) {
    double a = du[off] * du[off], b = u[off] * du[off], c = u[off] * u[off];
    for (int i = 1; i < d; ++i) {
      a -= du[off + i] * du[off + i];
      b -= u[off + i] * du[off + i];
      c -= u[off + i] * u[off + i];
    }
    b *= 2.0;
    const double disc = b * b - 4.0 * a * c;
    if (disc >= 0) {
      const double sq = std::sqrt(disc);
      const double q = -0.5 * (b + (b >= 0 ? sq : -sq));
      const double r1 = (a != 0) ? q / a : kBig;
      const double r2 = (q != 0) ? c / q : kBig;
      if (r1 > 0) alpha = std::min(alpha, r1);
      if (r2 > 0) alpha = std::min(alpha, r2);
    }
    if (du[off] < 0) alpha = std::min(alpha, -u[off] / du[off]);
    off += d;
  }
  return alpha;
}

// Nesterov-Todd scaling W with W z = W^{-1} s = lambda.
struct NTScaling {
  vec w_l;                                  // (nl)
  std::vector<double> eta;                  // per SOC block
  std::vector<vec> wbar;                    // per SOC block (d)
  bool identity = true;                     // W = I (init solve)
};

NTScaling nt_scaling(const ConeSpec& K, const double* s, const double* z) {
  NTScaling W;
  W.identity = false;
  W.w_l.resize(K.nl);
  for (int i = 0; i < K.nl; ++i)
    W.w_l[i] = std::sqrt(std::max(s[K.nz + i] / z[K.nz + i], 1e-300));
  int off = K.nz + K.nl;
  for (int d : K.socs) {
    double js = s[off] * s[off], jz = z[off] * z[off];
    for (int i = 1; i < d; ++i) {
      js -= s[off + i] * s[off + i];
      jz -= z[off + i] * z[off + i];
    }
    const double rs = std::sqrt(std::max(js, 1e-300));
    const double rz = std::sqrt(std::max(jz, 1e-300));
    double dot = 0;
    for (int i = 0; i < d; ++i) dot += (s[off + i] / rs) * (z[off + i] / rz);
    const double gamma = std::sqrt(std::max((1.0 + dot) / 2.0, 1e-300));
    vec wb(d);
    wb[0] = (s[off] / rs + z[off] / rz) / (2.0 * gamma);
    for (int i = 1; i < d; ++i)
      wb[i] = (s[off + i] / rs - z[off + i] / rz) / (2.0 * gamma);
    W.eta.push_back(std::sqrt(std::max(rs / rz, 1e-300)));
    W.wbar.push_back(std::move(wb));
    off += d;
  }
  return W;
}

// apply W (inverse=false) or W^{-1} (inverse=true); zero rows pass through
void nt_apply(const ConeSpec& K, const NTScaling& W, const double* v,
              double* out, bool inverse) {
  std::memcpy(out, v, sizeof(double) * K.nz);
  if (W.identity) {
    std::memcpy(out, v, sizeof(double) * K.m());
    return;
  }
  for (int i = 0; i < K.nl; ++i)
    out[K.nz + i] = inverse ? v[K.nz + i] / W.w_l[i] : v[K.nz + i] * W.w_l[i];
  int off = K.nz + K.nl;
  for (size_t kblk = 0; kblk < K.socs.size(); ++kblk) {
    const int d = K.socs[kblk];
    const vec& wb = W.wbar[kblk];
    const double eta = W.eta[kblk];
    const double sgn = inverse ? -1.0 : 1.0;
    double t = 0;
    for (int i = 1; i < d; ++i) t += sgn * wb[i] * v[off + i];
    const double out0 = wb[0] * v[off] + t;
    const double coef = v[off] + t / (1.0 + wb[0]);
    for (int i = 1; i < d; ++i)
      out[off + i] = (v[off + i] + coef * sgn * wb[i]) * (inverse ? 1.0 / eta : eta);
    out[off] = out0 * (inverse ? 1.0 / eta : eta);
    off += d;
  }
}

// ----------------------------- dense linalg --------------------------------

// LDL^T factorization (no pivoting; the KKT matrix is quasidefinite after
// regularization, which makes the plain factorization stable enough with
// iterative refinement on top). A is (nk x nk) row-major, overwritten.
bool ldlt_factor(vec& Afull, int nk) {
  double* A = Afull.data();
  for (int j = 0; j < nk; ++j) {
    double d = A[j * nk + j];
    for (int k = 0; k < j; ++k) {
      const double l = A[j * nk + k];
      d -= l * l * A[k * nk + k];
    }
    if (d == 0.0 || !std::isfinite(d)) return false;
    A[j * nk + j] = d;
    for (int i = j + 1; i < nk; ++i) {
      double v = A[i * nk + j];
      for (int k = 0; k < j; ++k)
        v -= A[i * nk + k] * A[j * nk + k] * A[k * nk + k];
      A[i * nk + j] = v / d;
    }
  }
  return true;
}

void ldlt_solve(const vec& Afull, int nk, double* x) {
  const double* A = Afull.data();
  for (int i = 0; i < nk; ++i)
    for (int k = 0; k < i; ++k) x[i] -= A[i * nk + k] * x[k];
  for (int i = 0; i < nk; ++i) x[i] /= A[i * nk + i];
  for (int i = nk - 1; i >= 0; --i)
    for (int k = i + 1; k < nk; ++k) x[i] -= A[k * nk + i] * x[k];
}

// ------------------------------- KKT solve ---------------------------------
//
// Reduced Schur KKT as in ops/ipm.py `_SchurKKT`: eliminate cone rows
//   dz_C = W^{-2} (A_C dx - rhs_C),
// factor the (n + nz) quasidefinite system
//   [ A_C' W^{-2} A_C + eps I    A_E' ] [dx  ]
//   [ A_E                      -eps I ] [dz_E],
// then refine against the exact (n+m) operator.

struct KKT {
  const ConeSpec* K;
  const double* A;   // row-major (m x n)
  int m, n, nz;
  double reg;
  vec fac;           // LDL^T factor of the reduced system, (n+nz)^2
  const NTScaling* W = nullptr;

  // w^{-2} applied to an m-vector's cone rows (zero rows untouched -> 0)
  void winv2(const double* v, double* out, vec& tmp) const {
    if (!W || W->identity) {
      std::memcpy(out, v, sizeof(double) * m);
      return;
    }
    nt_apply(*K, *W, v, tmp.data(), true);
    nt_apply(*K, *W, tmp.data(), out, true);
  }

  bool factor(const NTScaling* Wp) {
    W = Wp;
    const int nk = n + nz;
    fac.assign(static_cast<size_t>(nk) * nk, 0.0);
    // H = A_C' W^{-2} A_C: apply winv2 column-by-column of A_C
    vec col(m), wcol(m), tmp(m);
    std::vector<vec> WiAC(n, vec(m - nz));
    for (int j = 0; j < n; ++j) {
      for (int i = 0; i < m; ++i) col[i] = (i < nz) ? 0.0 : A[i * n + j];
      winv2(col.data(), wcol.data(), tmp);
      for (int i = nz; i < m; ++i) WiAC[j][i - nz] = wcol[i];
    }
    for (int j = 0; j < n; ++j)
      for (int jj = j; jj < n; ++jj) {
        double v = 0;
        for (int i = nz; i < m; ++i) v += A[i * n + j] * WiAC[jj][i - nz];
        fac[j * nk + jj] = v;
        fac[jj * nk + j] = v;
      }
    for (int j = 0; j < n; ++j) {
      const double scale_reg = reg + 100.0 * 2.2e-16 * std::fabs(fac[j * nk + j]);
      fac[j * nk + j] += scale_reg;
    }
    for (int i = 0; i < nz; ++i)
      for (int j = 0; j < n; ++j) {
        fac[(n + i) * nk + j] = A[i * n + j];
        fac[j * nk + (n + i)] = A[i * n + j];
      }
    for (int i = 0; i < nz; ++i) fac[(n + i) * nk + (n + i)] = -reg;
    return ldlt_factor(fac, nk);
  }

  // solve [0 A'; A -W^2] [dx; dz] = rhs ((n+m)-vector), in place
  void solve_once(const double* rhs, double* sol, vec& scratch) const {
    const int nk = n + nz;
    vec& red = scratch;  // (nk)
    red.assign(nk, 0.0);
    // r1 = rhs_x + A_C' W^{-2} rhs_C
    vec rC(m, 0.0), wC(m), tmp(m);
    for (int i = nz; i < m; ++i) rC[i] = rhs[n + i];
    winv2(rC.data(), wC.data(), tmp);
    for (int j = 0; j < n; ++j) {
      double v = rhs[j];
      for (int i = nz; i < m; ++i) v += A[i * n + j] * wC[i];
      red[j] = v;
    }
    for (int i = 0; i < nz; ++i) red[n + i] = rhs[n + i];
    ldlt_solve(fac, nk, red.data());
    for (int j = 0; j < n; ++j) sol[j] = red[j];
    for (int i = 0; i < nz; ++i) sol[n + i] = red[n + i];
    // dz_C = W^{-2}(A_C dx - rhs_C)
    vec acdx(m, 0.0);
    for (int i = nz; i < m; ++i) {
      double v = -rhs[n + i];
      for (int j = 0; j < n; ++j) v += A[i * n + j] * sol[j];
      acdx[i] = v;
    }
    winv2(acdx.data(), wC.data(), tmp);
    for (int i = nz; i < m; ++i) sol[n + i] = wC[i];
  }

  // two rounds of iterative refinement against the exact operator
  void solve(const double* rhs, double* sol) const {
    vec scratch;
    solve_once(rhs, sol, scratch);
    vec resid(n + m), w2z(m), tmp(m), corr(n + m);
    for (int round = 0; round < 2; ++round) {
      // resid = rhs - [A' dz; A dx - W^2 dz]
      if (!W || W->identity) {
        for (int i = 0; i < m; ++i) w2z[i] = (i < nz) ? 0.0 : sol[n + i];
      } else {
        vec zc(m);
        for (int i = 0; i < m; ++i) zc[i] = (i < nz) ? 0.0 : sol[n + i];
        nt_apply(*K, *W, zc.data(), tmp.data(), false);
        nt_apply(*K, *W, tmp.data(), w2z.data(), false);
        for (int i = 0; i < nz; ++i) w2z[i] = 0.0;
      }
      for (int j = 0; j < n; ++j) {
        double v = rhs[j];
        for (int i = 0; i < m; ++i) v -= A[i * n + j] * sol[n + i];
        resid[j] = v;
      }
      for (int i = 0; i < m; ++i) {
        double v = rhs[n + i] + w2z[i] * ((i < nz) ? 0.0 : 1.0);
        for (int j = 0; j < n; ++j) v -= A[i * n + j] * sol[j];
        resid[n + i] = v;
      }
      solve_once(resid.data(), corr.data(), scratch);
      for (int i = 0; i < n + m; ++i) sol[i] += corr[i];
    }
  }
};

// cone-aware Ruiz equilibration (mirrors ops/ipm.py `_equilibrate`)
void equilibrate(const ConeSpec& K, vec& A, int m, int n, vec& R, vec& D) {
  R.assign(m, 1.0);
  D.assign(n, 1.0);
  for (int it = 0; it < 3; ++it) {
    vec rn(m, 0.0), cn_(n, 0.0);
    for (int i = 0; i < m; ++i)
      for (int j = 0; j < n; ++j) {
        const double a = std::fabs(A[i * n + j]);
        rn[i] = std::max(rn[i], a);
        cn_[j] = std::max(cn_[j], a);
      }
    // uniform row scaling within each SOC block
    int off = K.nz + K.nl;
    for (int d : K.socs) {
      double mx = 0;
      for (int i = 0; i < d; ++i) mx = std::max(mx, rn[off + i]);
      for (int i = 0; i < d; ++i) rn[off + i] = mx;
      off += d;
    }
    for (int i = 0; i < m; ++i) {
      const double s = (rn[i] > 0) ? 1.0 / std::sqrt(rn[i]) : 1.0;
      R[i] *= s;
      for (int j = 0; j < n; ++j) A[i * n + j] *= s;
    }
    for (int j = 0; j < n; ++j) {
      const double s = (cn_[j] > 0) ? 1.0 / std::sqrt(cn_[j]) : 1.0;
      D[j] *= s;
      for (int i = 0; i < m; ++i) A[i * n + j] *= s;
    }
  }
}

double inf_norm(const double* v, int k) {
  double t = 0;
  for (int i = 0; i < k; ++i) t = std::max(t, std::fabs(v[i]));
  return t;
}

double dot(const double* a, const double* b, int k) {
  double t = 0;
  for (int i = 0; i < k; ++i) t += a[i] * b[i];
  return t;
}

// shift a vector to the strict interior of K (ops/ipm.py `_shift_interior`)
void shift_interior(const ConeSpec& K, double* v) {
  // nonneg rows
  double mn = kBig;
  for (int i = K.nz; i < K.nz + K.nl; ++i) mn = std::min(mn, v[i]);
  if (K.nl > 0 && mn < 1.0) {
    const double sh = 1.0 - mn;
    for (int i = K.nz; i < K.nz + K.nl; ++i) v[i] += sh;
  }
  int off = K.nz + K.nl;
  for (int d : K.socs) {
    double nt = 0;
    for (int i = 1; i < d; ++i) nt += v[off + i] * v[off + i];
    nt = std::sqrt(nt);
    if (v[off] - nt < 1.0) v[off] += 1.0 + nt - v[off];
    off += d;
  }
  std::memset(v, 0, sizeof(double) * K.nz);
}

}  // namespace

// ------------------------------- public API --------------------------------

extern "C" {

// status codes match scptoolbox_tpu/ops/ipm.py IPMStatus
enum ScptStatus {
  SCPT_OPTIMAL = 0,
  SCPT_PRIMAL_INFEASIBLE = 1,
  SCPT_DUAL_INFEASIBLE = 2,
  SCPT_MAX_ITER = 3,
  SCPT_ALMOST_OPTIMAL = 4,
};

// Solve min c'x s.t. Ax + s = b, s in K.
//  A row-major (m x n). Outputs: x (n), s (m), z (m),
//  info[6] = {status, iters, pres, dres, gap, obj}.
int scpt_ipm_solve(int m, int n, int nz, int nl, int nsoc,
                   const int* soc_dims, const double* A_in, const double* b_in,
                   const double* c_in, int max_iter, double tol,
                   double tol_almost, double* x_out, double* s_out,
                   double* z_out, double* info) {
  ConeSpec K;
  K.nz = nz;
  K.nl = nl;
  K.socs.assign(soc_dims, soc_dims + nsoc);
  if (K.m() != m) return -1;

  vec A(A_in, A_in + static_cast<size_t>(m) * n);
  vec b(b_in, b_in + m), c(c_in, c_in + n);
  vec R, D;
  equilibrate(K, A, m, n, R, D);
  for (int i = 0; i < m; ++i) b[i] *= R[i];
  for (int j = 0; j < n; ++j) c[j] *= D[j];

  const double norm_b = std::max(1.0, inf_norm(b.data(), m));
  const double norm_c = std::max(1.0, inf_norm(c.data(), n));
  const int deg = K.degree();

  KKT kkt;
  kkt.K = &K;
  kkt.A = A.data();
  kkt.m = m;
  kkt.n = n;
  kkt.nz = nz;
  kkt.reg = 1e-10;

  // ---- initialization (W = I), as ops/ipm.py:470-489 ----
  if (!kkt.factor(nullptr)) return SCPT_MAX_ITER;
  vec rhs(n + m, 0.0), sol(n + m, 0.0);
  for (int i = 0; i < m; ++i) rhs[n + i] = b[i];
  kkt.solve(rhs.data(), sol.data());
  vec x(sol.begin(), sol.begin() + n);
  vec s(m);
  for (int i = 0; i < m; ++i) s[i] = (i < nz) ? 0.0 : -sol[n + i];
  shift_interior(K, s.data());
  std::fill(rhs.begin(), rhs.end(), 0.0);
  for (int j = 0; j < n; ++j) rhs[j] = -c[j];
  kkt.solve(rhs.data(), sol.data());
  vec z(sol.begin() + n, sol.end());
  shift_interior(K, z.data());
  double tau = 1.0, kappa = 1.0;

  vec e(m, 0.0);  // Jordan identity
  for (int i = nz; i < nz + nl; ++i) e[i] = 1.0;
  {
    int off = nz + nl;
    for (int d : K.socs) {
      e[off] = 1.0;
      off += d;
    }
  }

  int status = SCPT_MAX_ITER;
  double pres = kBig, dres = kBig, gap = kBig;
  vec best_x = x, best_s = s, best_z = z;
  double best_tau = tau, best_kappa = kappa, best_merit = kBig;
  double best_pres = kBig, best_dres = kBig, best_gap = kBig;
  int it = 0;

  vec rx(n), rz(m);
  vec lam(m), ds_rhs(m), bs(m), tmp(m), tmp2(m);
  vec rhs1(n + m), rhs2(n + m), sol1(n + m), sol2(n + m);
  vec dx(n), dz(m), ds(m);

  auto residuals = [&]() {
    for (int j = 0; j < n; ++j) {
      double v = c[j] * tau;
      for (int i = 0; i < m; ++i) v += A[i * n + j] * z[i];
      rx[j] = v;
    }
    for (int i = 0; i < m; ++i) {
      double v = s[i] - b[i] * tau;
      for (int j = 0; j < n; ++j) v += A[i * n + j] * x[j];
      rz[i] = v;
    }
    return dot(c.data(), x.data(), n) + dot(b.data(), z.data(), m) + kappa;
  };

  auto convergence = [&](bool& stop) {
    residuals();
    const double inv_tau = 1.0 / tau;
    pres = inf_norm(rz.data(), m) * inv_tau / norm_b;
    dres = inf_norm(rx.data(), n) * inv_tau / norm_c;
    const double pcost = dot(c.data(), x.data(), n) * inv_tau;
    const double dcost = -dot(b.data(), z.data(), m) * inv_tau;
    gap = dot(s.data(), z.data(), m) * inv_tau * inv_tau;
    const double relgap =
        gap / std::max(1.0, std::min(std::fabs(pcost), std::fabs(dcost)));
    stop = false;
    if (pres < tol && dres < tol && relgap < tol) {
      status = SCPT_OPTIMAL;
      stop = true;
      return std::max({pres, dres, relgap});
    }
    const double bz = dot(b.data(), z.data(), m);
    if (bz < -tol * norm_b) {
      vec atz(n, 0.0);
      for (int j = 0; j < n; ++j)
        for (int i = 0; i < m; ++i) atz[j] += A[i * n + j] * z[i];
      if (inf_norm(atz.data(), n) * (-1.0 / bz) < tol) {
        status = SCPT_PRIMAL_INFEASIBLE;
        stop = true;
      }
    }
    const double cx = dot(c.data(), x.data(), n);
    if (!stop && cx < -tol * norm_c) {
      vec axs(m);
      for (int i = 0; i < m; ++i) {
        double v = s[i];
        for (int j = 0; j < n; ++j) v += A[i * n + j] * x[j];
        axs[i] = v;
      }
      if (inf_norm(axs.data(), m) * (-1.0 / cx) < tol) {
        status = SCPT_DUAL_INFEASIBLE;
        stop = true;
      }
    }
    double merit = std::max({pres, dres, relgap});
    if (!std::isfinite(merit)) merit = kBig;
    return merit;
  };

  bool stop0;
  double merit0 = convergence(stop0);
  best_merit = merit0;
  best_pres = pres;
  best_dres = dres;
  best_gap = gap;

  while (!stop0 && it < max_iter) {
    const double rtau = residuals();
    const double mu = (dot(s.data(), z.data(), m) + tau * kappa) / (deg + 1);

    NTScaling W = nt_scaling(K, s.data(), z.data());
    nt_apply(K, W, z.data(), lam.data(), false);
    for (int i = 0; i < nz; ++i) lam[i] = 0.0;
    if (!kkt.factor(&W)) {
      status = SCPT_MAX_ITER;
      break;
    }

    // constant column: [-c; b]
    for (int j = 0; j < n; ++j) rhs1[j] = -c[j];
    for (int i = 0; i < m; ++i) rhs1[n + i] = b[i];
    kkt.solve(rhs1.data(), sol1.data());

    double dtau = 0, dkap = 0;
    auto directions = [&](double sigma, const double* eta_corr,
                          double dkap_corr) {
      const double one_m_sig = 1.0 - sigma;
      cone_product(K, lam.data(), lam.data(), ds_rhs.data());
      for (int i = 0; i < m; ++i)
        ds_rhs[i] = -ds_rhs[i] - (eta_corr ? eta_corr[i] : 0.0) + sigma * mu * e[i];
      const double d_kap = -tau * kappa - dkap_corr + sigma * mu;
      cone_div(K, lam.data(), ds_rhs.data(), tmp.data());
      nt_apply(K, W, tmp.data(), bs.data(), false);
      for (int i = 0; i < nz; ++i) bs[i] = 0.0;
      for (int j = 0; j < n; ++j) rhs2[j] = -one_m_sig * rx[j];
      for (int i = 0; i < m; ++i) rhs2[n + i] = -one_m_sig * rz[i] - bs[i];
      kkt.solve(rhs2.data(), sol2.data());

      const double denom = dot(c.data(), sol1.data(), n) +
                           dot(b.data(), sol1.data() + n, m) - kappa / tau;
      const double numer = -one_m_sig * rtau - dot(c.data(), sol2.data(), n) -
                           dot(b.data(), sol2.data() + n, m) - d_kap / tau;
      dtau = numer / denom;
      for (int j = 0; j < n; ++j) dx[j] = sol1[j] * dtau + sol2[j];
      for (int i = 0; i < m; ++i) dz[i] = sol1[n + i] * dtau + sol2[n + i];
      // ds = (bs - W^2 dz) on cone rows
      vec zc(m);
      for (int i = 0; i < m; ++i) zc[i] = (i < nz) ? 0.0 : dz[i];
      nt_apply(K, W, zc.data(), tmp.data(), false);
      nt_apply(K, W, tmp.data(), tmp2.data(), false);
      for (int i = 0; i < m; ++i)
        ds[i] = (i < nz) ? 0.0 : (bs[i] - tmp2[i]);
      dkap = (d_kap - kappa * dtau) / tau;
    };

    auto step_len = [&]() {
      double a = std::min(max_step(K, s.data(), ds.data()),
                          max_step(K, z.data(), dz.data()));
      if (dtau < 0) a = std::min(a, -tau / dtau);
      if (dkap < 0) a = std::min(a, -kappa / dkap);
      return a;
    };

    // predictor
    directions(0.0, nullptr, 0.0);
    const double alpha_aff = std::min(1.0, step_len());
    double sigma = std::pow(1.0 - alpha_aff, 3.0);
    sigma = std::min(std::max(sigma, 1e-8), 1.0 - 1e-8);

    // Mehrotra corrector: eta = (W^{-1} ds_a) o (W dz_a) with
    // W^{-1} ds_a = -lam - W dz_a
    vec dz_t(m), ds_t(m), eta_corr(m);
    {
      vec zc(m);
      for (int i = 0; i < m; ++i) zc[i] = (i < nz) ? 0.0 : dz[i];
      nt_apply(K, W, zc.data(), dz_t.data(), false);
      for (int i = 0; i < m; ++i)
        ds_t[i] = (i < nz) ? 0.0 : (-lam[i] - dz_t[i]);
      for (int i = 0; i < nz; ++i) dz_t[i] = 0.0;
      cone_product(K, ds_t.data(), dz_t.data(), eta_corr.data());
    }
    const double dkap_corr = dtau * dkap;

    directions(sigma, eta_corr.data(), dkap_corr);
    const double alpha = std::min(1.0, 0.99 * step_len());

    bool finite = std::isfinite(alpha) && std::isfinite(dtau) &&
                  std::isfinite(dkap) && (tau + alpha * dtau > 0);
    for (int j = 0; finite && j < n; ++j) finite = std::isfinite(dx[j]);
    for (int i = 0; finite && i < m; ++i)
      finite = std::isfinite(ds[i]) && std::isfinite(dz[i]);
    if (!finite) break;  // NaN guard: keep best iterate

    for (int j = 0; j < n; ++j) x[j] += alpha * dx[j];
    for (int i = 0; i < m; ++i) {
      s[i] += alpha * ds[i];
      z[i] += alpha * dz[i];
    }
    tau += alpha * dtau;
    kappa += alpha * dkap;
    ++it;

    const double merit = convergence(stop0);
    if (merit < best_merit) {
      best_merit = merit;
      best_x = x;
      best_s = s;
      best_z = z;
      best_tau = tau;
      best_kappa = kappa;
      best_pres = pres;
      best_dres = dres;
      best_gap = gap;
    }
  }

  const bool is_cert =
      status == SCPT_PRIMAL_INFEASIBLE || status == SCPT_DUAL_INFEASIBLE;
  bool dummy;
  const double fmerit = convergence(dummy);
  if (!is_cert && best_merit < fmerit) {
    x = best_x;
    s = best_s;
    z = best_z;
    tau = best_tau;
    kappa = best_kappa;
    pres = best_pres;
    dres = best_dres;
    gap = best_gap;
  }
  const double merit_f = std::min(best_merit, fmerit);
  if (status == SCPT_MAX_ITER && merit_f < tol_almost)
    status = SCPT_ALMOST_OPTIMAL;

  const double scale_out = is_cert ? 1.0 : 1.0 / tau;
  for (int j = 0; j < n; ++j) x_out[j] = x[j] * scale_out * D[j];
  for (int i = 0; i < m; ++i) {
    s_out[i] = s[i] * scale_out / R[i];
    z_out[i] = z[i] * scale_out * R[i];
  }
  double obj = 0;
  for (int j = 0; j < n; ++j) obj += c_in[j] * x_out[j];
  info[0] = status;
  info[1] = it;
  info[2] = pres;
  info[3] = dres;
  info[4] = gap;
  info[5] = obj;
  return 0;
}

}  // extern "C"
