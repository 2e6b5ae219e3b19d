"""Native C++ combinatorics vs the canonical Python implementations."""
import numpy as np
import pytest

from ssmtoybox_tpu import native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="no C++ toolchain available")


def _py_n_sum_k(n, k):
    # canonical recursion, inlined to stay independent of the dispatcher
    if k == 0:
        return np.zeros((n, 1), dtype=np.int64)
    if k == 1:
        return np.eye(n, dtype=np.int64)
    a = _py_n_sum_k(n, k - 1)
    eye = np.eye(n, dtype=np.int64)
    cols = [a[:, i] + eye[:, j] for i in range(n - 1) for j in range(i, n)]
    temp = (np.stack(cols, axis=1) if cols else np.zeros((n, 0), dtype=np.int64))
    return np.hstack((temp, a[:, n - 1:] + eye[:, -1, None]))


@requires_native
@pytest.mark.parametrize("n,k", [(1, 3), (2, 2), (3, 4), (5, 3), (4, 0)])
def test_n_sum_k_matches_python(n, k):
    np.testing.assert_array_equal(native.n_sum_k(n, k), _py_n_sum_k(n, k))


@requires_native
@pytest.mark.parametrize("dim,gen", [(2, [1.5]), (3, [2.0, 2.0]), (4, [1.0, 2.0]),
                                     (5, [0.7, 0.7])])
def test_symmetric_set_matches_python(dim, gen):
    import ssmtoybox_tpu.points as pts
    # bypass the native dispatch inside symmetric_set by comparing against a
    # hand-rolled copy of the Python recursion
    def py_sym(dim, gen):
        nz = np.zeros((dim, 1))
        if len(gen) == 0:
            return nz
        gen = np.asarray(gen, dtype=float)
        eps = np.spacing(1.0)
        cols = []
        uind = np.arange(dim)
        for i in range(dim):
            u = nz.copy(); u[i] = gen[0]
            if len(gen) > 1:
                if np.abs(gen[0] - gen[1]) < eps:
                    V = py_sym(dim - i - 1, gen[1:])
                    for j in range(V.shape[1]):
                        uu = u.copy(); uu[i + 1:, 0] = V[:, j]
                        cols.extend([uu, -uu])
                else:
                    V = py_sym(dim - 1, gen[1:])
                    for j in range(V.shape[1]):
                        uu = u.copy(); uu[uind != i, 0] = V[:, j]
                        cols.extend([uu, -uu])
            else:
                cols.extend([u, -u])
        return np.hstack(cols) if cols else np.empty((dim, 0))

    np.testing.assert_allclose(native.symmetric_set(dim, gen), py_sym(dim, gen))


@requires_native
def test_vandermonde_matches_python():
    from ssmtoybox_tpu.utils.combin import vandermonde_np
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7)
    mul = np.hstack([np.zeros((3, 1), dtype=int), np.eye(3, dtype=int),
                     2 * np.eye(3, dtype=int)])
    np.testing.assert_allclose(native.vandermonde(mul, x), vandermonde_np(mul, x),
                               rtol=1e-12)


@requires_native
def test_fs_points_use_native_and_match_goldens():
    """fs_points (which now dispatches to the native generator) must still
    match the reference goldens entry-for-entry."""
    import os
    from ssmtoybox_tpu import points as pts
    g = np.load(os.path.join(os.path.dirname(__file__), "goldens", "transforms.npz"))
    np.testing.assert_allclose(pts.fs_points(3, 5, dof=6.0), g["fs3_pts_d5"], atol=1e-12)
