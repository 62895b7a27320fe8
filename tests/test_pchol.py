"""Pivoted-Cholesky fast-path solver tests.

Cross-checks against the eigh+pivoted-QR reference machinery: identical
pivot ordering (a mathematical identity, not an approximation), factor
identities, equivalent truncation ranks, and end-to-end quantization
quality parity with the eigh path.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from tgq.core.quant import QuantSpec, fake_quantize
from tgq.solver import quantize_weight, trunc_spectral_factor, truncate_rank
from tgq.solver.hessian import hessian_from_activations
from tgq.solver.pchol import pchol_factor, pivoted_cholesky, trace_rank


def make_h(rng, n, decay=0.99, rank=None):
    if rank is None:
        a = rng.normal(size=(4 * n, n)) * (decay ** np.arange(n))[None, :]
    else:
        a = rng.normal(size=(rank, n))
    a = a.astype(np.float64)
    return a.T @ a / a.shape[0]


def test_pchol_reconstructs_full_rank(rng):
    n = 96
    h = make_h(rng, n) + 0.01 * np.eye(n)
    lt, perm, dhist = pivoted_cholesky(h, panel=32)
    lt = np.asarray(lt, np.float64)
    rec = lt.T @ lt
    err = np.linalg.norm(rec - h) / np.linalg.norm(h)
    assert err < 1e-4, err
    # trace decomposition: Σ d_k = tr(H)
    np.testing.assert_allclose(np.asarray(dhist).sum(), np.trace(h), rtol=1e-4)
    assert sorted(np.asarray(perm).tolist()) == list(range(n))


def test_pchol_pivots_match_pivoted_qr_of_sqrt(rng):
    """BG pivots of QR(H^1/2) == diagonal pivots of pchol(H)."""
    n = 64
    h = make_h(rng, n, decay=0.9) + 1e-6 * np.eye(n)
    lam, v = scipy.linalg.eigh(h)
    s = np.sqrt(np.clip(lam, 1e-12, None))[::-1]
    vh = v.T[::-1]
    _, qr_perm = scipy.linalg.qr(s[:, None] * vh, mode="r", pivoting=True)
    _, pc_perm, _ = pivoted_cholesky(h, panel=16)
    # compare the leading pivots (ties deep in the tail may reorder)
    np.testing.assert_array_equal(np.asarray(pc_perm)[: n // 2], qr_perm[: n // 2])


def test_trace_rank_equals_energy_rank_on_eigs():
    """On an exact eigenvalue sequence the two rules agree."""
    lam_desc = np.array([100.0, 10.0, 1.0, 0.1, 0.01, 0.001])
    s = np.sqrt(lam_desc)
    for eps in (1e-1, 1e-2, 1e-3, 1e-5):
        assert trace_rank(lam_desc, eps) == truncate_rank(s, eps, "energy")


def test_pchol_factor_full_rank_inverse(rng):
    n = 64
    h = make_h(rng, n) + 0.05 * np.eye(n)
    f = pchol_factor(h, eps=1e-12)
    assert f.rank == n
    r = np.asarray(f.r_full).astype(np.float64)
    h_perm = h[np.ix_(f.perm, f.perm)]
    hinv = np.linalg.inv(h_perm)
    err = np.linalg.norm(r.T @ r - hinv) / np.linalg.norm(hinv)
    assert err < 1e-3, err
    # r_x reconstructs H_perm
    rx = np.asarray(f.r_x).astype(np.float64)
    err_x = np.linalg.norm(rx.T @ rx - h_perm) / np.linalg.norm(h_perm)
    assert err_x < 1e-4


def test_pchol_factor_truncated(rng):
    n, k = 80, 20
    h = make_h(rng, n, rank=k) + 1e-9 * np.eye(n)
    f = pchol_factor(h, eps=1e-7)
    assert f.rank <= k + 2
    r = np.asarray(f.r_full).astype(np.float64)
    # tail rows are identity rows
    tail = r[f.rank :]
    expect = np.zeros_like(tail)
    expect[np.arange(tail.shape[0]), np.arange(f.rank, n)] = 1.0
    # X3 GEMMs on native TPU leave ~2e-6 noise on the constructed tail
    np.testing.assert_allclose(tail, expect, atol=1e-5)
    # top block approximates the pseudo-inverse of the pchol approximation
    lt = np.asarray(f.r_x).astype(np.float64)[: f.rank]
    h_approx = lt.T @ lt  # rank-r approx of H_perm
    r_top = r[: f.rank]
    pinv = np.linalg.pinv(h_approx, rcond=1e-10)
    err = np.linalg.norm(r_top.T @ r_top - pinv) / np.linalg.norm(pinv)
    assert err < 5e-2, err


def test_pchol_quantization_quality_matches_eigh(rng):
    """End-to-end: pchol-mode GPTQ ≈ eigh-mode GPTQ, both beat RTN."""
    m, n = 32, 128
    cov = 0.92 ** np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    x = (rng.normal(size=(8192, n)) @ np.linalg.cholesky(cov + 1e-9 * np.eye(n)).T
         ).astype(np.float32)
    w = rng.normal(size=(m, n)).astype(np.float32)
    h = np.asarray(hessian_from_activations(jnp.asarray(x)))
    spec = QuantSpec(bits=3, group_size=-1, sym=False)

    f_eigh = trunc_spectral_factor(h, eps=1e-6, method="energy")
    f_pchol = pchol_factor(h, eps=1e-6)
    y = x @ w.T

    def err(wq):
        return np.linalg.norm(y - x @ np.asarray(wq).T) / np.linalg.norm(y)

    e_eigh = err(quantize_weight(jnp.asarray(w), f_eigh, spec).w_q)
    e_pchol = err(quantize_weight(jnp.asarray(w), f_pchol, spec).w_q)
    e_rtn = err(fake_quantize(jnp.asarray(w), spec))
    assert e_pchol < 0.75 * e_rtn, (e_pchol, e_rtn)
    assert e_pchol < 1.15 * e_eigh, (e_pchol, e_eigh)


def test_pchol_zero_hessian_safe():
    f = pchol_factor(np.zeros((16, 16)), eps=1e-6)
    assert np.isfinite(f.r_full).all()
    assert f.rank >= 1


def test_pallas_panel_sweep_matches_jnp(rng):
    """The Pallas panel kernel (interpret mode on CPU) reproduces the
    jnp fori_loop sweep: same pivots, same trace history, same strip."""
    from tgq.solver.pchol import _pivoted_cholesky_jit, _pivoted_cholesky_pallas

    n = 256
    h = jnp.asarray(make_h(rng, n, decay=0.97) + 1e-8 * np.eye(n), jnp.float32)
    lt_j, perm_j, dh_j, ph_j = _pivoted_cholesky_jit(h, panel=128)
    lt_p, perm_p, dh_p, ph_p = _pivoted_cholesky_pallas(h, panel=128,
                                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(perm_p), np.asarray(perm_j))
    np.testing.assert_allclose(np.asarray(dh_p), np.asarray(dh_j),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ph_p), np.asarray(ph_j),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lt_p), np.asarray(lt_j),
                               rtol=1e-3, atol=1e-5)


def test_pallas_panel_sweep_rank_deficient(rng):
    """Exhausted-rank behavior matches: zero rows, consistent histories."""
    from tgq.solver.pchol import _pivoted_cholesky_jit, _pivoted_cholesky_pallas

    n = 256
    h = jnp.asarray(make_h(rng, n, rank=64), jnp.float32)  # rank <= 64
    lt_j, perm_j, dh_j, ph_j = _pivoted_cholesky_jit(h, panel=128)
    lt_p, perm_p, dh_p, ph_p = _pivoted_cholesky_pallas(h, panel=128,
                                                        interpret=True)
    k = 48  # well inside the numerically resolvable prefix
    np.testing.assert_array_equal(np.asarray(perm_p)[:k], np.asarray(perm_j)[:k])
    # native TPU: both sweeps run X3 GEMM Schur updates; exhausted-rank
    # entries are arithmetic noise ~1e-3 of the top pivot
    np.testing.assert_allclose(np.asarray(dh_p), np.asarray(dh_j),
                               rtol=1e-2, atol=5e-3)
    rec = np.asarray(lt_p, np.float64)
    np.testing.assert_allclose(rec.T @ rec, np.asarray(h, np.float64),
                               rtol=0, atol=1e-4)


def test_extreme_spectrum_stays_finite(rng):
    """cond ≳ 1e9 Hessians (5-decade spectra, seen on real 8B layers)
    used to drive the f32 factor build to an all-NaN R; the escalation
    ladder (pivot_rtol ×, then host-f64 eigh fallback) must keep the
    factor — and the quantized weights — finite."""
    from tgq.core.quant import QuantSpec
    from tgq.solver import hessian_from_activations, quantize_weight
    from tgq.solver.pchol import pchol_factor

    d = 256
    u, _ = np.linalg.qr(rng.normal(size=(d, d)))
    s = 10.0 ** (-5 * np.arange(d) / d)
    x = ((rng.normal(size=(4096, d)) * s) @ u.T).astype(np.float32)
    h = np.asarray(hessian_from_activations(jnp.asarray(x)))
    f = pchol_factor(h, eps=1e-6)
    assert np.isfinite(np.asarray(f.r_full)).all()
    w = rng.normal(size=(64, d)).astype(np.float32)
    spec = QuantSpec(bits=3, group_size=128, sym=False)
    wq = np.asarray(quantize_weight(jnp.asarray(w), f, spec,
                                    with_error=False).w_q)
    assert np.isfinite(wq).all()


def test_outlier_spectrum_quality_matches_eigh():
    """Channel-outlier Hessians (the real-LLM shape: a few variances
    1e4x the bulk) must NOT collapse the pchol rank: r5 found the
    bf16-X3 Schur updates' noise floor swallowed the entire bulk on
    the TPU path (rank 735 -> 8, quality -20% vs eigh); the sweep now
    runs exact-f32 Schur updates (_dot_schur).  This guards the host
    path; the TPU-path measurement is committed in RESULTS.md."""
    import numpy as np
    import jax.numpy as jnp

    from tgq.core.quant import QuantSpec
    from tgq.solver.factorize import trunc_spectral_factor
    from tgq.solver.gptq_loop import quantize_weight
    from tgq.solver.pchol import pchol_factor

    rng = np.random.default_rng(0)
    n, m, N = 256, 128, 2048
    d = np.concatenate([np.full(4, 1e4), np.logspace(0, -3, n - 4)])
    rng.shuffle(d)
    r_corr = 0.9 ** np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    c = d[:, None] ** 0.5 * np.linalg.cholesky(r_corr + 1e-12 * np.eye(n))
    x = rng.standard_normal((N, n)) @ c.T
    h = x.T @ x / N
    w = rng.standard_normal((m, n)).astype(np.float32)
    spec = QuantSpec(bits=4, group_size=64, sym=False)

    fp = pchol_factor(jnp.asarray(h, jnp.float32), eps=1e-6)
    fe = trunc_spectral_factor(h, eps=1e-6, method="energy")
    # rank must cover the bulk, not just the outliers
    assert fp.rank > n // 4, (fp.rank, fe.rank)
    wq_p = np.asarray(quantize_weight(jnp.asarray(w), fp, spec,
                                      with_error=False).w_q, np.float64)
    wq_e = np.asarray(quantize_weight(jnp.asarray(w), fe, spec,
                                      with_error=False).w_q, np.float64)
    ep = np.linalg.norm((w - wq_p) @ c) / np.linalg.norm(w @ c)
    ee = np.linalg.norm((w - wq_e) @ c) / np.linalg.norm(w @ c)
    assert ep <= ee * 1.05, (ep, ee, fp.rank, fe.rank)
