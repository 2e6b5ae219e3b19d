"""Shared harness for the reproducible experiment scripts.

Replaces the reference's per-script metric aggregation loops
(``research/gpq/icinco_demo.py:17-79``, ``research/tpq/tpq_base.py:154-192``):
all Monte-Carlo runs of a filter execute as one vmapped program, and the
RMSE / NCI / inclination / NLL scores reduce on-device.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from ssmtoybox_tpu.utils import metrics as M
from ssmtoybox_tpu.utils.profiling import sync


def setup_jax(use_x64: bool = True):
    # SSMTPU_PLATFORM=cpu pins the backend through the config API — the only
    # reliable way on this image (env vars alone don't stop a dead TPU
    # tunnel from hanging backend init; sitecustomize imports jax at
    # interpreter start)
    platform = os.environ.get("SSMTPU_PLATFORM", "").strip().lower()
    if platform:
        jax.config.update("jax_platforms", platform)
    if use_x64:
        jax.config.update("jax_enable_x64", True)
    # Persistent XLA compilation cache (shared with bench.py): through the
    # dev tunnel, compile time dominates study wall-clock — the compiled
    # marginal filter alone compiles for tens of minutes — and re-runs of
    # the same study shapes are common.  SSMTPU_COMPILE_CACHE=0 disables.
    if os.environ.get("SSMTPU_COMPILE_CACHE", "1") != "0":
        import atexit
        from ssmtoybox_tpu.utils import hostenv
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_bench_cache")
        hostenv.enable_persistent_cache(jax, cache)
        atexit.register(hostenv.release_persistent_cache, cache)


@jax.jit
def study_scores(x_true, fi_mean, fi_cov):
    """Time-averaged scores per MC run.

    Parameters
    ----------
    x_true : (D, N, M) true states.
    fi_mean : (M, D, N) filtered means.
    fi_cov : (M, D, D, N) filtered covariances.

    Returns
    -------
    dict with per-run arrays (M,): ``rmse``, ``nci``, ``inc``, ``nll``.

    The per-time-step sample MSE matrix (the NCI/INC normalizer,
    ``utils.py:41-64``) is computed over the FINITE runs only — one diverged
    run would otherwise make it NaN at every later step and poison the
    credibility scores of every healthy run.
    """
    x = jnp.moveaxis(x_true, -1, 0)                       # (M, D, N)
    err = fi_mean - x                                     # (M, D, N)

    rmse_runs = jnp.sqrt(jnp.mean(jnp.sum(err ** 2, axis=1), axis=-1))  # (M,)
    finite = jnp.isfinite(rmse_runs)
    n_ok = jnp.clip(jnp.sum(finite.astype(err.dtype)), 1.0)
    err_ok = jnp.where(finite[:, None, None], err, 0.0)
    MSE = jnp.einsum("mdn,men->nde", err_ok, err_ok) / n_ok   # (N, D, D)
    jitter = 1e-12 * jnp.eye(err.shape[1], dtype=err.dtype)

    def one_step(x_k, m_k, P_k, MSE_k):
        # x_k, m_k (M, D); P_k (M, D, D) — reuse the library metrics
        lcr = jax.vmap(lambda xx, mm, PP: M.log_cred_ratio(
            xx, mm, PP, MSE_k + jitter))(x_k, m_k, P_k)
        nll = jax.vmap(M.neg_log_likelihood)(x_k, m_k, P_k)
        return lcr, nll

    lcr, nll = jax.vmap(one_step, in_axes=(2, 2, 3, 0), out_axes=1)(
        x, fi_mean, fi_cov, MSE)                           # (M, N)
    return {
        "rmse": rmse_runs,
        "nci": jnp.mean(jnp.abs(lcr), axis=1),
        "inc": jnp.mean(lcr, axis=1),
        "nll": jnp.mean(nll, axis=1),
    }


def run_filter_bank(algs: dict, y, x, score_fn=study_scores, verbose=True,
                    warmup=True, engine: str = "f64"):
    """Run every filter over all MC trajectories (vmapped) and score it.

    ``y``/``x`` follow the reference layout (dim, steps, mc_sims).
    Returns (scores_df, raw) where ``scores_df`` is a pandas table of
    mean +/- 2*std-of-mean per algorithm.

    ``warmup=True`` runs each filter's batch twice so the reported
    wall-clock excludes trace+compile (the batch is shape-specialized, so a
    smaller warm batch would compile a different program).  For very large
    banks where the doubled compute outweighs the timing nicety, pass
    ``warmup=False`` — wallclock_s then includes compilation.

    ``engine`` selects the batch-filter arithmetic for Gaussian filters that
    accept it (:meth:`GaussianInference.forward_pass_batch`): ``"f64"``
    (default), ``"dd"`` (double-double f32-pair fast path), ``"auto"``.
    Per filter, the engine that actually ran lands in the ``engine`` column;
    with ``engine="dd"`` an unsupported filter (wrong transform/model class,
    or a class without the switch — Student, marginal, square-root) falls
    back to f64 WITH a stderr line naming the reason, so a bank mixing
    EKF/UKF/GPQ still runs end-to-end.  The strict loud-error contract
    lives at the API level (:func:`ssmtoybox_tpu.ssinf.gaussian_filter_batch`).
    """
    import inspect

    from ssmtoybox_tpu.ops.ddvec import dd_check

    ys = jnp.moveaxis(jnp.asarray(y), -1, 0)
    rows = {}
    raw = {}

    def resolve_engine(name, alg):
        if engine == "f64":
            return "f64"
        if "engine" not in inspect.signature(alg.forward_pass_batch).parameters:
            if engine == "dd":
                print(f"{name}: engine='dd' unsupported (no engine switch on "
                      f"{type(alg).__name__}.forward_pass_batch); using f64",
                      file=sys.stderr)
            return "f64"
        try:
            dd_check(alg.mod_dyn, alg.mod_obs, alg.tf_dyn, alg.tf_obs)
        except (ValueError, KeyError) as e:
            if engine == "dd":
                print(f"{name}: engine='dd' unsupported ({e}); using f64",
                      file=sys.stderr)
            return "f64"
        return "dd"

    for name, alg in algs.items():
        used_engine = resolve_engine(name, alg)

        def fwd():
            if used_engine == "f64":
                return alg.forward_pass_batch(ys)
            return alg.forward_pass_batch(ys, engine=used_engine)

        if warmup:
            res = fwd()
            sync(res)      # first call: trace + compile + warm
        t0 = time.time()
        res = fwd()
        sync(res)          # forced completion (block_until_ready can return early)
        t_run = time.time() - t0    # steady-state wall-clock, compile excluded
        scores = score_fn(jnp.asarray(x), res.fi_mean, res.fi_cov)
        raw[name] = (res, scores)
        m = ys.shape[0]
        row = {}
        # divergence-aware aggregation: filters can lose positive definiteness
        # on individual trajectories (the reference crashes outright there,
        # e.g. its BSQ smoke tests skip known-hard cases, test_ssinf.py:99);
        # diverged runs are excluded and counted instead of poisoning means.
        # A run counts as diverged if ANY score is non-finite — a filter can
        # lose PD (NaN nll/nci through the covariance logdet) while its mean
        # stays finite, and masking on rmse alone would poison those columns
        finite = np.ones(m, dtype=bool)
        for v in scores.values():
            finite &= np.isfinite(np.asarray(v))
        n_ok = max(int(finite.sum()), 1)
        for k, v in scores.items():
            vv = np.asarray(v)[finite]
            row[k] = float(np.mean(vv)) if len(vv) else float("nan")
            row[k + "_2std"] = float(2 * np.std(vv) / np.sqrt(n_ok)) if len(vv) else float("nan")
        row["diverged"] = int(m - finite.sum())
        row["wallclock_s"] = t_run
        if engine != "f64":
            row["engine"] = used_engine
        rows[name] = row
        if verbose:
            print(f"{name:>12}: done in {t_run:6.3f} s", file=sys.stderr)
    return pd.DataFrame(rows).T, raw


def save_results(path: str, **arrays):
    """Cache study outputs to disk (the reference research scripts use
    ``joblib.dump``/``scipy.io.savemat`` for the same purpose, SURVEY §5.4)."""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})
    print(f"results saved to {path}", file=sys.stderr)


def load_results(path: str):
    """Reload cached study outputs (returns a dict of arrays), or None."""
    if not path or not os.path.exists(path):
        return None
    return dict(np.load(path, allow_pickle=False))


def print_tables(df: pd.DataFrame, title: str, latex: bool = False):
    print(f"\n===== {title} =====")
    with pd.option_context("display.width", 160, "display.max_columns", None,
                           "display.float_format", "{:.4f}".format):
        print(df)
    if latex:
        print(df.to_latex(float_format="%.4f"))
