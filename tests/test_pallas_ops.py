"""Pallas kernels verified in interpret mode against the jnp reference paths."""
import numpy as np
import jax
import jax.numpy as jnp

from ssmtoybox_tpu.ops import student_expectations, vandermonde
from ssmtoybox_tpu.bq.kernels import RBFGauss
from ssmtoybox_tpu.utils.combin import vandermonde as vandermonde_jnp


def test_vandermonde_matches_jnp():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 7))
    mul = np.hstack([np.zeros((3, 1), int), np.eye(3, dtype=int), 2 * np.eye(3, dtype=int)])
    out = vandermonde(mul, x)
    ref = vandermonde_jnp(jnp.asarray(mul), x)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_student_expectations_match_gaussian_closed_form():
    """For huge dof the Student density is Gaussian: the fused kernel must
    reproduce the RBF closed-form expectations within MC error."""
    par = np.array([[1.0, 2.0]])
    x = jnp.asarray(np.array([[0.0, 1.3, -0.8]]))
    q, r, Q = student_expectations(par, x, dof=500.0, num_samples=400_000,
                                   key=jax.random.PRNGKey(42), chunk=4096)
    kern = RBFGauss.create(1, par)
    np.testing.assert_allclose(q, kern.exp_x_kx(par, x), atol=5e-3)
    np.testing.assert_allclose(r, kern.exp_x_xkx(par, x), atol=5e-3)
    np.testing.assert_allclose(Q, kern.exp_x_kxkx(par, par, x), atol=5e-3)


def test_student_expectations_multidim():
    par = np.array([[1.0, 1.5, 2.0]])
    x = jnp.asarray(np.random.RandomState(1).randn(2, 5))
    q, r, Q = student_expectations(par, x, dof=300.0, num_samples=200_000,
                                   key=jax.random.PRNGKey(7), chunk=4096)
    kern = RBFGauss.create(2, par)
    np.testing.assert_allclose(q, kern.exp_x_kx(par, x), atol=8e-3)
    np.testing.assert_allclose(r, kern.exp_x_xkx(par, x), atol=8e-3)
    np.testing.assert_allclose(Q, kern.exp_x_kxkx(par, par, x), atol=8e-3)
    np.testing.assert_allclose(Q, Q.T, atol=1e-6)
