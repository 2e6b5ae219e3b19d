// Native host-side combinatorics for ssmtoybox_tpu.
//
// The device compute path is JAX/XLA/Pallas; these routines cover the
// *host-side, trace-time* constructions that the reference accelerates with
// its single Numba kernel (vandermonde, utils.py:478-502) plus the
// recursive constructors whose Python cost grows combinatorially with
// dimension: the multi-index generator n_sum_k (utils.py:459-475) and the
// McNamee-Stenger fully-symmetric point set (mtran.py:522-578).
//
// Algorithms and output ORDERING mirror the pure-Python implementations in
// ssmtoybox_tpu.utils.combin / ssmtoybox_tpu.points exactly — the bindings
// are verified element-for-element against them in the test suite, and the
// Python versions remain the canonical fallback.
//
// Build: g++ -O3 -shared -fPIC fastcombin.cpp -o libfastcombin.so
// (done lazily by ssmtoybox_tpu/native/__init__.py; plain C ABI, ctypes).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// n_sum_k: all n-tuples of non-negative ints summing to k, column-major
// recursion identical to utils.combin.n_sum_k
// ---------------------------------------------------------------------------

// columns stored row-major as vector of columns (each length n)
std::vector<std::vector<int64_t>> n_sum_k_impl(int n, int k) {
    std::vector<std::vector<int64_t>> cols;
    if (k == 0) {
        cols.emplace_back(n, 0);
        return cols;
    }
    if (k == 1) {
        for (int j = 0; j < n; ++j) {
            std::vector<int64_t> c(n, 0);
            c[j] = 1;
            cols.push_back(std::move(c));
        }
        return cols;
    }
    auto a = n_sum_k_impl(n, k - 1);
    // temp block: for i in 0..n-2, for j in i..n-1: a[:, i] + e_j
    for (int i = 0; i < n - 1; ++i) {
        for (int j = i; j < n; ++j) {
            std::vector<int64_t> c = a[i];
            c[j] += 1;
            cols.push_back(std::move(c));
        }
    }
    // tail block: a[:, n-1:] + e_{n-1}
    for (size_t i = n - 1; i < a.size(); ++i) {
        std::vector<int64_t> c = a[i];
        c[n - 1] += 1;
        cols.push_back(std::move(c));
    }
    return cols;
}

// ---------------------------------------------------------------------------
// fully-symmetric point set, recursion identical to points.symmetric_set
// ---------------------------------------------------------------------------

std::vector<std::vector<double>> symmetric_set_impl(int dim, const double* gen, int gen_len) {
    std::vector<std::vector<double>> cols;
    if (gen_len == 0) {
        cols.emplace_back(dim, 0.0);
        return cols;
    }
    const double eps = 2.220446049250313e-16;  // np.spacing(1.0)
    for (int i = 0; i < dim; ++i) {
        std::vector<double> u(dim, 0.0);
        u[i] = gen[0];
        if (gen_len > 1) {
            if (std::fabs(gen[0] - gen[1]) < eps) {
                auto V = symmetric_set_impl(dim - i - 1, gen + 1, gen_len - 1);
                for (auto& v : V) {
                    std::vector<double> uu = u;
                    for (int r = 0; r < dim - i - 1; ++r) uu[i + 1 + r] = v[r];
                    cols.push_back(uu);
                    for (auto& x : uu) x = -x;
                    cols.push_back(std::move(uu));
                }
            } else {
                auto V = symmetric_set_impl(dim - 1, gen + 1, gen_len - 1);
                for (auto& v : V) {
                    std::vector<double> uu = u;
                    int r = 0;
                    for (int d = 0; d < dim; ++d) {
                        if (d == i) continue;
                        uu[d] = v[r++];
                    }
                    uu[i] = gen[0];
                    cols.push_back(uu);
                    for (auto& x : uu) x = -x;
                    cols.push_back(std::move(uu));
                }
            }
        } else {
            cols.push_back(u);
            std::vector<double> un = u;
            for (auto& x : un) x = -x;
            cols.push_back(std::move(un));
        }
    }
    return cols;
}

}  // namespace

extern "C" {

// Returns the number of columns; fills nothing when out == nullptr.
// out is (n, count) in C (row-major) layout: out[row * count + col].
int64_t ssmtpu_n_sum_k(int n, int k, int64_t* out, int64_t out_cols) {
    auto cols = n_sum_k_impl(n, k);
    const int64_t count = static_cast<int64_t>(cols.size());
    if (out != nullptr && out_cols >= count) {
        for (int64_t c = 0; c < count; ++c)
            for (int r = 0; r < n; ++r)
                out[static_cast<int64_t>(r) * out_cols + c] = cols[c][r];
    }
    return count;
}

// out is (dim, count) row-major: out[row * count + col].
int64_t ssmtpu_symmetric_set(int dim, const double* gen, int gen_len,
                             double* out, int64_t out_cols) {
    auto cols = symmetric_set_impl(dim, gen, gen_len);
    const int64_t count = static_cast<int64_t>(cols.size());
    if (out != nullptr && out_cols >= count) {
        for (int64_t c = 0; c < count; ++c)
            for (int r = 0; r < dim; ++r)
                out[static_cast<int64_t>(r) * out_cols + c] = cols[c][r];
    }
    return count;
}

// vdm[n_pts, n_basis] row-major; mul_ind (d, q) row-major; x (d, n) row-major.
void ssmtpu_vandermonde(const int64_t* mul_ind, int d, int q,
                        const double* x, int n, double* out) {
    for (int p = 0; p < n; ++p) {
        for (int b = 0; b < q; ++b) {
            double acc = 1.0;
            for (int dd = 0; dd < d; ++dd) {
                const int64_t e = mul_ind[static_cast<int64_t>(dd) * q + b];
                if (e != 0) acc *= std::pow(x[static_cast<int64_t>(dd) * n + p],
                                            static_cast<double>(e));
            }
            out[static_cast<int64_t>(p) * q + b] = acc;
        }
    }
}

}  // extern "C"
