"""Solver stack tests (SURVEY.md §4 mechanism-2 turned into a real suite).

Oracles are independent numpy implementations written from the math, not
from tgq's code: a column-by-column GPTQ loop, closed-form factor
identities (RᵀR ≈ H⁺ on the retained subspace), and the synthetic
correlated-activation quality comparison from the reference's
benchmarks.py blueprint (TruncGPTQ must beat RTN on output error).
"""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from tgq.core.quant import QuantSpec
from tgq.solver import (
    HessianAccumulator,
    SketchAccumulator,
    gptq_cholesky_factor,
    hessian_from_activations,
    pivoted_qr,
    quantize_weight,
    sketch_factor,
    trunc_spectral_factor,
    truncate_rank,
)


def make_ar1_activations(rng, n_tokens, n_features, rho=0.9):
    """AR(1)-correlated Gaussian activations (reference benchmarks.py:18-45)."""
    cov_chol = np.linalg.cholesky(
        rho ** np.abs(np.subtract.outer(np.arange(n_features), np.arange(n_features)))
        + 1e-9 * np.eye(n_features)
    )
    z = rng.normal(size=(n_tokens, n_features))
    return (z @ cov_chol.T).astype(np.float32)


# ---------------------------------------------------------------- hessian


def test_hessian_accumulator_matches_f64(rng):
    x = rng.normal(size=(4096, 64)).astype(np.float32)
    acc = HessianAccumulator.init(64)
    for i in range(0, 4096, 512):
        acc = acc.update(jnp.asarray(x[i : i + 512]))
    h = np.asarray(acc.finalize())
    h64 = (x.astype(np.float64).T @ x.astype(np.float64)) / 4096
    assert np.abs(h - h64).max() / np.abs(h64).max() < 1e-5


def test_hessian_3d_input(rng):
    x = rng.normal(size=(4, 32, 16)).astype(np.float32)
    acc = HessianAccumulator.init(16).update(jnp.asarray(x))
    h = np.asarray(acc.finalize())
    flat = x.reshape(-1, 16).astype(np.float64)
    np.testing.assert_allclose(h, flat.T @ flat / 128, rtol=1e-5, atol=1e-7)


def test_empty_accumulator_safe():
    h = np.asarray(HessianAccumulator.init(8).finalize())
    assert (h == 0).all()


def test_sketch_accumulator_scale(rng):
    x = rng.normal(size=(256, 32)).astype(np.float32)
    # reference default sketch_ratio is 4.0 => rank = 4 * in_features
    acc = SketchAccumulator.init(32, rank=512, seed=0).update(jnp.asarray(x))
    y = np.asarray(acc.finalize())
    assert y.shape == (512, 32)
    # E[YᵀY] ≈ XᵀX/N under the 1/sqrt(N·rank) scaling
    gram_est = y.T @ y
    gram_true = x.T @ x / 256
    rel = np.linalg.norm(gram_est - gram_true) / np.linalg.norm(gram_true)
    assert rel < 0.35  # stochastic estimate; error ~ 1/sqrt(rank)


# ---------------------------------------------------------------- truncation


def test_truncate_rank_energy():
    s = np.array([10.0, 1.0, 0.1, 0.01])
    # keep everything for tiny eps
    assert truncate_rank(s, 1e-12, "energy") == 4
    # large eps keeps only the top component (cumsum rule + increment)
    assert truncate_rank(s, 0.5, "energy") == 1
    # eps between the 2nd and 3rd component energies
    energy = s**2
    eps = (energy[2] + energy[3]) / energy.sum() * 1.5
    assert truncate_rank(s, eps, "energy") == 2


def test_truncate_rank_mean_trimmed():
    s = np.array([100.0] + [1.0] * 40 + [1e-6] * 10)
    # ref value = mean(s[1:33]) = 1.0; eps=1e-3 keeps everything above 1e-3
    assert truncate_rank(s, 1e-3, "mean_trimmed") == 41
    assert truncate_rank(s, 1e-9, "mean_trimmed") == 51


def test_truncate_rank_bounds():
    assert truncate_rank(np.array([1.0]), 0.99, "energy") == 1
    assert truncate_rank(np.array([1.0, 1.0]), 1e-30, "mean_trimmed") == 2


# ---------------------------------------------------------------- pivoted QR


@pytest.mark.parametrize("backend", ["host", "jax"])
def test_pivoted_qr_reconstruction(rng, backend):
    a = rng.normal(size=(48, 64)).astype(np.float32)
    r, perm = pivoted_qr(a, backend=backend)
    r = np.asarray(r)
    perm = np.asarray(perm)
    # |diag| non-increasing (rank-revealing property)
    d = np.abs(np.diagonal(r))
    assert (d[:-1] >= d[1:] - 1e-4 * d[0]).all()
    # A[:, perm] = QR  =>  (A[:,perm])ᵀ A[:,perm] = RᵀR
    ap = a[:, perm].astype(np.float64)
    tol = 1e-10 if backend == "host" else 1e-3
    err = np.linalg.norm(ap.T @ ap - r.astype(np.float64).T @ r) / np.linalg.norm(ap.T @ ap)
    assert err < tol
    # perm is a permutation
    assert sorted(perm.tolist()) == list(range(64))


def test_pivoted_qr_jax_matches_host_order(rng):
    # strongly scaled columns: pivot order must equal host order
    a = rng.normal(size=(32, 32)).astype(np.float32)
    a = a * np.logspace(0, -6, 32)[None, :].astype(np.float32)
    a = a[:, rng.permutation(32)]
    _, perm_h = pivoted_qr(a, backend="host")
    _, perm_j = pivoted_qr(a, backend="jax")
    np.testing.assert_array_equal(np.asarray(perm_h), np.asarray(perm_j))


# ---------------------------------------------------------------- factorize


def test_trunc_factor_full_rank_identity(rng):
    """Full-rank case: RᵀR ≈ H⁻¹ in permuted order."""
    x = rng.normal(size=(2048, 32))
    h = x.T @ x / 2048
    f = trunc_spectral_factor(h, eps=1e-12, method="energy")
    assert f.rank == 32
    r = f.r_full.astype(np.float64)
    h_perm = h[np.ix_(f.perm, f.perm)]
    err = np.linalg.norm(r.T @ r - np.linalg.inv(h_perm)) / np.linalg.norm(
        np.linalg.inv(h_perm)
    )
    assert err < 1e-5
    # upper triangular, positive diagonal
    assert np.allclose(r, np.triu(r))
    assert (np.diagonal(r) > 0).all()


def test_trunc_factor_truncated_pseudoinverse(rng):
    """Rank-deficient case: RᵀR ≈ H⁺ restricted to the retained subspace,
    and tail rows of r_full are identity rows."""
    n, k = 48, 12
    b = rng.normal(size=(n, k))
    h = b @ b.T / k + 1e-10 * np.eye(n)
    f = trunc_spectral_factor(h, eps=1e-6, method="energy")
    assert f.rank <= k + 2
    r = f.r_full.astype(np.float64)
    # tail rows are exact identity rows
    tail = r[f.rank :, :]
    expect = np.zeros_like(tail)
    expect[np.arange(tail.shape[0]), np.arange(f.rank, n)] = 1.0
    np.testing.assert_array_equal(tail, expect)
    # top block: RᵀR ≈ pinv(H) in permuted order
    r_top = r[: f.rank, :]
    h_perm = h[np.ix_(f.perm, f.perm)]
    pinv = np.linalg.pinv(h_perm, rcond=1e-8)
    err = np.linalg.norm(r_top.T @ r_top - pinv) / np.linalg.norm(pinv)
    assert err < 1e-3
    # r_x is H^{1/2} factor: R_xᵀR_x ≈ H in permuted order
    rx = f.r_x.astype(np.float64)
    err_x = np.linalg.norm(rx.T @ rx - h_perm) / np.linalg.norm(h_perm)
    assert err_x < 1e-5


def test_gptq_cholesky_factor(rng):
    x = rng.normal(size=(1024, 24))
    h = x.T @ x / 1024
    f = gptq_cholesky_factor(h, actorder=True, damp_percent=0.01)
    assert f.rank == 24
    # actorder: diag of permuted H is descending
    d = np.diagonal(h)[f.perm]
    assert (d[:-1] >= d[1:]).all()
    # RᵀR ≈ (H_perm + damp·mean·I)⁻¹
    r = f.r_full.astype(np.float64)
    h_perm = h[np.ix_(f.perm, f.perm)] + 0.01 * np.diagonal(h).mean() * np.eye(24)
    err = np.linalg.norm(r.T @ r - np.linalg.inv(h_perm)) / np.linalg.norm(
        np.linalg.inv(h_perm)
    )
    assert err < 1e-5


def test_gptq_cholesky_singular_fallback():
    h = np.zeros((8, 8))
    f = gptq_cholesky_factor(h, actorder=False)
    # all-zero H: ladder damps diag by damp*mean where mean->1.0 fallback,
    # so cholesky succeeds on damp*I; factor must be finite either way
    assert np.isfinite(f.r_full).all()


def test_sketch_factor_runs(rng):
    x = rng.normal(size=(512, 32)).astype(np.float32)
    acc = SketchAccumulator.init(32, rank=128, seed=1).update(jnp.asarray(x))
    y = np.asarray(acc.finalize())
    f = sketch_factor(y, eps=1e-4, method="energy")
    assert f.r_full.shape == (32, 32)
    assert 1 <= f.rank <= 32


# ---------------------------------------------------------------- gptq loop


def gptq_numpy_oracle(w, r_full, perm, scale, zero, min_q, max_q):
    """Independent column-by-column reference (float64, no blocking)."""
    w = w[:, perm].astype(np.float64).copy()
    s = scale[:, perm].astype(np.float64)
    z = zero[:, perm].astype(np.float64)
    r = r_full.astype(np.float64)
    n = w.shape[1]
    q_out = np.zeros_like(w)
    for k in range(n):
        qk = np.clip(np.floor(w[:, k] / s[:, k] + z[:, k] + 0.5), min_q, max_q)
        q_deq = (qk - z[:, k]) * s[:, k]
        e = (w[:, k] - q_deq) / r[k, k]
        q_out[:, k] = qk
        if k + 1 < n:
            w[:, k + 1 :] -= np.outer(e, r[k, k + 1 :])
    inv = np.argsort(perm)
    return q_out[:, inv]


def expand_np(scale, zero, n):
    reps = n // scale.shape[1]
    return np.repeat(scale, reps, axis=1), np.repeat(zero, reps, axis=1)


@pytest.mark.parametrize("block_size", [16, 64, 512])
def test_quantize_weight_matches_numpy_oracle(rng, block_size):
    m, n = 24, 64
    x = make_ar1_activations(rng, 2048, n)
    h = hessian_from_activations(jnp.asarray(x))
    f = trunc_spectral_factor(np.asarray(h), eps=1e-10, method="energy")
    w = rng.normal(size=(m, n)).astype(np.float32)
    spec = QuantSpec(bits=4, group_size=32, sym=False)
    res = quantize_weight(jnp.asarray(w), f, spec, block_size=block_size)

    # oracle uses the same static-group params (computed pre-perm)
    from tgq.core.quant import find_params

    p = find_params(jnp.asarray(w), spec)
    s_np, z_np = expand_np(np.asarray(p.scale), np.asarray(p.zero), n)
    q_ref = gptq_numpy_oracle(w, f.r_full, f.perm, s_np, z_np, spec.min_q, spec.max_q)

    codes = np.asarray(res.codes)
    # f32 vs f64 rounding can flip a code at exact half-boundaries; allow
    # a tiny fraction of off-by-one codes, none larger
    diff = np.abs(codes - q_ref)
    assert diff.max() <= 1, f"max code diff {diff.max()}"
    assert (diff > 0).mean() < 0.01


def test_quantize_truncated_tail_is_rtn(rng):
    """Columns beyond rank must be plain RTN of the propagated weight."""
    m, n, k = 8, 32, 6
    b = rng.normal(size=(n, k))
    h = b @ b.T / k + 1e-9 * np.eye(n)
    f = trunc_spectral_factor(h, eps=1e-8, method="energy")
    assert f.rank < n
    w = rng.normal(size=(m, n)).astype(np.float32)
    spec = QuantSpec(bits=4, group_size=-1, sym=False)
    res = quantize_weight(jnp.asarray(w), f, spec, block_size=8)
    # oracle agrees (identity tail rows make the oracle do RTN there too)
    from tgq.core.quant import find_params

    p = find_params(jnp.asarray(w), spec)
    s_np, z_np = expand_np(np.asarray(p.scale), np.asarray(p.zero), n)
    q_ref = gptq_numpy_oracle(w, f.r_full, f.perm, s_np, z_np, spec.min_q, spec.max_q)
    assert np.abs(np.asarray(res.codes) - q_ref).max() <= 1


def test_trunc_beats_rtn_on_correlated_data(rng):
    """The acceptance micro-test (reference benchmarks.py experiment):
    on AR(1)-correlated activations, TruncGPTQ output error < RTN."""
    m, n = 32, 128
    x = make_ar1_activations(rng, 8192, n, rho=0.9)
    w = rng.normal(size=(m, n)).astype(np.float32)
    h = hessian_from_activations(jnp.asarray(x))
    spec = QuantSpec(bits=3, group_size=-1, sym=False)

    f = trunc_spectral_factor(np.asarray(h), eps=1e-6, method="energy")
    res = quantize_weight(jnp.asarray(w), f, spec)
    from tgq.core.quant import fake_quantize

    w_rtn = np.asarray(fake_quantize(jnp.asarray(w), spec))

    y = x @ w.T
    err_gptq = np.linalg.norm(y - x @ np.asarray(res.w_q).T) / np.linalg.norm(y)
    err_rtn = np.linalg.norm(y - x @ w_rtn.T) / np.linalg.norm(y)
    assert err_gptq < 0.7 * err_rtn, (err_gptq, err_rtn)
    # and the logged rel_error metric is finite and consistent
    assert np.isfinite(float(res.rel_error))


def test_gptq_cholesky_path_beats_rtn(rng):
    m, n = 16, 64
    x = make_ar1_activations(rng, 4096, n, rho=0.9)
    w = rng.normal(size=(m, n)).astype(np.float32)
    h = np.asarray(hessian_from_activations(jnp.asarray(x)))
    f = gptq_cholesky_factor(h, actorder=True)
    spec = QuantSpec(bits=3, group_size=-1, sym=False)
    res = quantize_weight(jnp.asarray(w), f, spec)
    from tgq.core.quant import fake_quantize

    w_rtn = np.asarray(fake_quantize(jnp.asarray(w), spec))
    y = x @ w.T
    err_gptq = np.linalg.norm(y - x @ np.asarray(res.w_q).T) / np.linalg.norm(y)
    err_rtn = np.linalg.norm(y - x @ w_rtn.T) / np.linalg.norm(y)
    assert err_gptq < err_rtn


def test_trunc_regimes_cell():
    """The regime-hunt harness (tgq.cli.trunc_regimes) stays runnable:
    one tiny cell per spectrum produces finite errors, correct row
    structure, and the channel spectrum reproduces diag spread."""
    import numpy as np

    from tgq.cli.trunc_regimes import make_true_cov, run_cell

    rng = np.random.default_rng(0)
    for spectrum in ("log", "outlier", "channel"):
        c, lam = make_true_cov(64, 4.0, rng, spectrum=spectrum)
        h = c @ c.T
        assert np.isfinite(h).all()
        if spectrum == "channel":
            d = np.diagonal(h)
            assert d.max() / np.median(d) > 50  # outlier channels
        rows = run_cell(64, 32, 4.0, 128, [4], seed=0, group_size=32,
                        damp_percent=0.01, heavy_tail=False,
                        eps_grid=(1e-6, 1e-3), spectrum=spectrum)
        methods = {r["method"] for r in rows}
        assert methods == {"gptq", "rtn", "trunc_best"}, methods
        for r in rows:
            assert np.isfinite(r["err_oos"]) and r["err_oos"] > 0
            assert 0.0 <= r["mass_top"] <= 1.0
