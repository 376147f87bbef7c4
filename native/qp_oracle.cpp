// qp_oracle: self-contained dense convex-QP solver (Mehrotra
// predictor-corrector primal-dual interior point), used as the
// high-accuracy oracle standing in for the reference's CPLEX backend
// (reference: workspace/lib/qpcpp/src/solvers/CPLEX.cpp) when measuring
// "control deviation vs exact solver" (BASELINE.json: <1e-3).
//
//   minimize    0.5 x'Px + q'x
//   subject to  lb_i <= (Ax)_i <= ub_i        (equality when lb_i == ub_i)
//
// Exposed as a C ABI for ctypes; no external dependencies (no Eigen/BLAS —
// the problem sizes here are n <= ~64, so naive O(n^3) dense kernels are
// plenty for an oracle).
//
// Build: g++ -O2 -shared -fPIC -o libqp_oracle.so qp_oracle.cpp

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

using std::vector;

constexpr double KIND_INF = 1e19;  // bounds beyond this are "infinite"

// Solve M y = r in place via LU with partial pivoting. M is k x k
// row-major and is destroyed. Returns false on singularity.
bool lu_solve(vector<double>& M, vector<double>& r, int k) {
    vector<int> piv(k);
    for (int i = 0; i < k; ++i) piv[i] = i;
    for (int col = 0; col < k; ++col) {
        int p = col;
        double best = std::fabs(M[col * k + col]);
        for (int i = col + 1; i < k; ++i) {
            double v = std::fabs(M[i * k + col]);
            if (v > best) { best = v; p = i; }
        }
        if (best < 1e-300) return false;
        if (p != col) {
            for (int j = 0; j < k; ++j) std::swap(M[col * k + j], M[p * k + j]);
            std::swap(r[col], r[p]);
        }
        double d = M[col * k + col];
        for (int i = col + 1; i < k; ++i) {
            double f = M[i * k + col] / d;
            if (f == 0.0) continue;
            M[i * k + col] = 0.0;
            for (int j = col + 1; j < k; ++j) M[i * k + j] -= f * M[col * k + j];
            r[i] -= f * r[col];
        }
    }
    for (int i = k - 1; i >= 0; --i) {
        double acc = r[i];
        for (int j = i + 1; j < k; ++j) acc -= M[i * k + j] * r[j];
        r[i] = acc / M[i * k + i];
    }
    return true;
}

struct Rows {
    // equality rows:   E x = b          (me x n)
    // inequality rows: G x <= h         (mi x n)
    vector<double> E, b, G, h;
    int me = 0, mi = 0;
};

Rows split_rows(int n, int m, const double* A, const double* lb, const double* ub) {
    Rows r;
    for (int i = 0; i < m; ++i) {
        const double* row = A + i * n;
        double nrm = 0.0;
        for (int j = 0; j < n; ++j) nrm = std::max(nrm, std::fabs(row[j]));
        if (nrm == 0.0) continue;  // masked/padded row
        // equilibrate: scaling a row by 1/||row||_inf preserves the
        // feasible set and keeps h at O(1) even for the capped 1e6 CBF
        // bounds, which otherwise stall the IPM's centering
        const double inv = 1.0 / nrm;
        if (ub[i] - lb[i] < 1e-12) {  // equality
            for (int j = 0; j < n; ++j) r.E.push_back(row[j] * inv);
            r.b.push_back(ub[i] * inv);
            ++r.me;
        } else {
            if (ub[i] < KIND_INF) {
                for (int j = 0; j < n; ++j) r.G.push_back(row[j] * inv);
                r.h.push_back(ub[i] * inv);
                ++r.mi;
            }
            if (lb[i] > -KIND_INF) {
                for (int j = 0; j < n; ++j) r.G.push_back(-row[j] * inv);
                r.h.push_back(-lb[i] * inv);
                ++r.mi;
            }
        }
    }
    return r;
}

}  // namespace

extern "C" {

// Returns 0 = optimal, 1 = max-iter (x still usable), 2 = numerical failure.
// info_out (optional, len >= 3): [iterations, final mu, primal residual]
int qp_solve(int n, int m, const double* P_in, const double* q_in,
             const double* A, const double* lb, const double* ub,
             double* x_out, double* info_out) {
    // Objective normalization: scaling (P, q) by gamma leaves x* unchanged
    // while keeping the dual residual and mu at O(1). Without it the
    // fov-flagship QPs (slack costs ~5e4) blow the Mehrotra iteration up
    // (observed mu ~ 1e18 at max-iter) and the absolute mu stopping bars
    // are meaningless.
    double cost_scale = 1.0;
    for (int i = 0; i < n; ++i) cost_scale = std::max(cost_scale, std::fabs(q_in[i]));
    for (int i = 0; i < n * n; ++i) cost_scale = std::max(cost_scale, std::fabs(P_in[i]));
    const double gamma = 1.0 / cost_scale;
    vector<double> Pv(P_in, P_in + (size_t)n * n), qv(q_in, q_in + n);
    for (double& v : Pv) v *= gamma;
    for (double& v : qv) v *= gamma;
    const double* P = Pv.data();
    const double* q = qv.data();

    Rows rows = split_rows(n, m, A, lb, ub);
    const int me = rows.me, mi = rows.mi;
    const int k = n + me;

    vector<double> x(n, 0.0), nu(me, 0.0), lam(mi, 1.0), s(mi, 1.0);

    // scale-aware start for s: s = max(1, |h - Gx|)
    for (int i = 0; i < mi; ++i) {
        double gx = 0.0;
        for (int j = 0; j < n; ++j) gx += rows.G[i * n + j] * x[j];
        s[i] = std::max(1.0, std::fabs(rows.h[i] - gx));
    }

    vector<double> M(k * k), rhs(k), rd(n), rpe(me), rpi(mi);
    vector<double> dx(n), dnu(me), dlam(mi), ds(mi);

    const int max_iter = 60;
    int it = 0;
    double mu = 1.0, pri_res = 0.0;

    for (it = 0; it < max_iter; ++it) {
        // residuals
        for (int i = 0; i < n; ++i) {
            double acc = q[i];
            for (int j = 0; j < n; ++j) acc += P[i * n + j] * x[j];
            for (int e = 0; e < me; ++e) acc += rows.E[e * n + i] * nu[e];
            for (int g = 0; g < mi; ++g) acc += rows.G[g * n + i] * lam[g];
            rd[i] = acc;
        }
        for (int e = 0; e < me; ++e) {
            double acc = -rows.b[e];
            for (int j = 0; j < n; ++j) acc += rows.E[e * n + j] * x[j];
            rpe[e] = acc;
        }
        for (int g = 0; g < mi; ++g) {
            double acc = s[g] - rows.h[g];
            for (int j = 0; j < n; ++j) acc += rows.G[g * n + j] * x[j];
            rpi[g] = acc;
        }
        mu = 0.0;
        for (int g = 0; g < mi; ++g) mu += s[g] * lam[g];
        mu = mi ? mu / mi : 0.0;

        // Primal-based stopping: mu ~ duality gap, rpe/rpi ~ feasibility.
        // The dual residual rd is deliberately excluded — on rows made
        // redundant by the 1e6-capped CBF bounds the multipliers are
        // ill-determined and rd can stay large while x is optimal to 1e-7
        // (verified against a 2e4-iteration f64 ADMM solve).
        double feas = 0.0;
        for (double v : rpe) feas = std::max(feas, std::fabs(v));
        for (double v : rpi) feas = std::max(feas, std::fabs(v));
        pri_res = feas;
        // Without inequalities the dual residual IS well-determined and is
        // the only convergence signal (mu == 0 from the start — stopping on
        // it alone would return the x=0 initial point as "optimal").
        double rd_norm = 0.0;
        for (double v : rd) rd_norm = std::max(rd_norm, std::fabs(v));
        if (mi == 0) {
            if (rd_norm < 1e-9 && feas < 1e-9) break;
        } else {
            // mu < 1e-6 with tight feasibility gives x accurate to ~1e-7 on
            // the flagship QPs (measured against 2e4-iteration f64 ADMM) —
            // two orders beyond the 1e-3 oracle requirement. Keep polishing
            // to 1e-11 when the problem allows, but accept 1e-6.
            if (mu < 1e-11 && feas < 1e-9) break;
            if (it >= 25 && mu < 1e-6 && feas < 1e-8) break;
        }

        // KKT matrix: [[P + G' (Lam/S) G + delta*I, E'], [E, 0]]
        auto build_and_solve = [&](const vector<double>& rc, bool corrector,
                                    const vector<double>& dlam_aff,
                                    const vector<double>& ds_aff) -> bool {
            std::fill(M.begin(), M.end(), 0.0);
            for (int i = 0; i < n; ++i)
                for (int j = 0; j < n; ++j) M[i * k + j] = P[i * n + j];
            for (int i = 0; i < n; ++i) M[i * k + i] += 1e-10;
            for (int g = 0; g < mi; ++g) {
                double w = std::min(lam[g] / s[g], 1e14);
                const double* grow = rows.G.data() + g * n;
                for (int i = 0; i < n; ++i) {
                    if (grow[i] == 0.0) continue;
                    double wi = w * grow[i];
                    for (int j = 0; j < n; ++j) M[i * k + j] += wi * grow[j];
                }
            }
            for (int e = 0; e < me; ++e)
                for (int j = 0; j < n; ++j) {
                    M[j * k + (n + e)] = rows.E[e * n + j];
                    M[(n + e) * k + j] = rows.E[e * n + j];
                }
            for (int e = 0; e < me; ++e) M[(n + e) * k + (n + e)] = -1e-12;

            // rhs: -rd + G' S^-1 (rc - Lam rpi);  eq part: -rpe
            for (int i = 0; i < n; ++i) {
                double acc = -rd[i];
                for (int g = 0; g < mi; ++g) {
                    double t = (rc[g] - lam[g] * rpi[g]) / s[g];
                    acc += rows.G[g * n + i] * t;
                }
                rhs[i] = acc;
            }
            for (int e = 0; e < me; ++e) rhs[n + e] = -rpe[e];

            vector<double> Mc = M;
            if (!lu_solve(Mc, rhs, k)) return false;
            for (int i = 0; i < n; ++i) dx[i] = rhs[i];
            for (int e = 0; e < me; ++e) dnu[e] = rhs[n + e];
            for (int g = 0; g < mi; ++g) {
                double gdx = 0.0;
                for (int j = 0; j < n; ++j) gdx += rows.G[g * n + j] * dx[j];
                ds[g] = -rpi[g] - gdx;
                dlam[g] = (-rc[g] - lam[g] * ds[g]) / s[g];
            }
            (void)corrector; (void)dlam_aff; (void)ds_aff;
            return true;
        };

        // affine (predictor) direction: rc = s .* lam
        vector<double> rc(mi);
        for (int g = 0; g < mi; ++g) rc[g] = s[g] * lam[g];
        if (!build_and_solve(rc, false, {}, {})) return 2;

        auto step_len = [&](const vector<double>& v, const vector<double>& dv) {
            double a = 1.0;
            for (size_t i = 0; i < v.size(); ++i)
                if (dv[i] < 0.0) a = std::min(a, -v[i] / dv[i]);
            return a;
        };
        double a_aff = std::min(step_len(s, ds), step_len(lam, dlam));

        double mu_aff = 0.0;
        for (int g = 0; g < mi; ++g)
            mu_aff += (s[g] + a_aff * ds[g]) * (lam[g] + a_aff * dlam[g]);
        mu_aff = mi ? mu_aff / mi : 0.0;
        double sigma = (mu > 0) ? std::pow(mu_aff / mu, 3.0) : 0.0;

        // corrector: rc = s.*lam + ds_aff.*dlam_aff - sigma*mu
        vector<double> ds_aff = ds, dlam_aff = dlam;
        for (int g = 0; g < mi; ++g)
            rc[g] = s[g] * lam[g] + ds_aff[g] * dlam_aff[g] - sigma * mu;
        if (!build_and_solve(rc, true, dlam_aff, ds_aff)) return 2;

        double a = std::min(1.0, 0.99 * std::min(step_len(s, ds), step_len(lam, dlam)));
        for (int i = 0; i < n; ++i) x[i] += a * dx[i];
        for (int e = 0; e < me; ++e) nu[e] += a * dnu[e];
        for (int g = 0; g < mi; ++g) { s[g] += a * ds[g]; lam[g] += a * dlam[g]; }
    }

    std::memcpy(x_out, x.data(), n * sizeof(double));
    if (info_out) { info_out[0] = it; info_out[1] = mu; info_out[2] = pri_res; }
    return (it < max_iter) ? 0 : 1;
}

// Batched entry: B problems with identical shapes, contiguous arrays.
int qp_solve_batch(int B, int n, int m, const double* P, const double* q,
                   const double* A, const double* lb, const double* ub,
                   double* x_out, int* status_out) {
    int worst = 0;
    for (int b = 0; b < B; ++b) {
        int st = qp_solve(n, m, P + (size_t)b * n * n, q + (size_t)b * n,
                          A + (size_t)b * m * n, lb + (size_t)b * m,
                          ub + (size_t)b * m, x_out + (size_t)b * n, nullptr);
        if (status_out) status_out[b] = st;
        worst = std::max(worst, st);
    }
    return worst;
}

}  // extern "C"
