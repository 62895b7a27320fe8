"""Blocked Cholesky / chunked triangular solves vs scipy."""
import numpy as np
import jax.numpy as jnp
import scipy.linalg

from tgq.solver.blocked_linalg import (
    blocked_cholesky_lower,
    blocked_cholesky_upper,
    cho_solve_chunked,
    solve_lower_chunked,
)


def spd(rng, n):
    a = rng.normal(size=(n, n))
    return (a @ a.T / n + np.eye(n)).astype(np.float32)


def test_blocked_cholesky_matches_scipy(rng):
    a = spd(rng, 300)
    l = np.asarray(blocked_cholesky_lower(jnp.asarray(a), block=128))
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(l, ref, rtol=2e-4, atol=2e-4)
    u = np.asarray(blocked_cholesky_upper(jnp.asarray(a), block=128))
    np.testing.assert_allclose(u, ref.T, rtol=2e-4, atol=2e-4)


def test_blocked_cholesky_small_passthrough(rng):
    a = spd(rng, 64)
    l = np.asarray(blocked_cholesky_lower(jnp.asarray(a), block=128))
    ref = scipy.linalg.cholesky(a.astype(np.float64), lower=True)
    np.testing.assert_allclose(l, ref, rtol=2e-4, atol=2e-4)


def test_chunked_solves(rng):
    a = spd(rng, 160)
    l = scipy.linalg.cholesky(a, lower=True).astype(np.float32)
    b = rng.normal(size=(160, 200)).astype(np.float32)
    x = np.asarray(solve_lower_chunked(jnp.asarray(l), jnp.asarray(b), chunk=64))
    np.testing.assert_allclose(l @ x, b, rtol=1e-3, atol=1e-3)
    y = np.asarray(cho_solve_chunked(jnp.asarray(l), jnp.asarray(b), chunk=64))
    np.testing.assert_allclose(a @ y, b, rtol=5e-3, atol=5e-3)


def test_blocked_triangular_inverse(rng):
    from tgq.solver.blocked_linalg import (
        blocked_triangular_inverse_lower,
        cho_solve_gemm,
    )

    for n, block in ((96, 32), (160, 64), (64, 128)):  # ragged + passthrough
        a = spd(rng, n)
        l = scipy.linalg.cholesky(a, lower=True).astype(np.float32)
        x = np.asarray(blocked_triangular_inverse_lower(jnp.asarray(l),
                                                        block=block))
        assert np.allclose(np.triu(x, 1), 0.0)
        np.testing.assert_allclose(l @ x, np.eye(n), rtol=1e-3, atol=1e-3)
        b = rng.normal(size=(n, 50)).astype(np.float32)
        y = np.asarray(cho_solve_gemm(jnp.asarray(l), jnp.asarray(b),
                                      block=block))
        np.testing.assert_allclose(a @ y, b, rtol=5e-3, atol=5e-3)
