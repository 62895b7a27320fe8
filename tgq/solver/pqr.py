"""Rank-revealing (pivoted) QR — the reference's defining numerical dep.

The reference reaches Magma's ``dgeqp3`` through a torch→JAX DLPack seam
(reference gptq_utils.py:113-116, README.md:107).  On TPU there is no
Magma and no f64, so this module provides:

- ``backend="host"`` (default): float64 ``scipy.linalg.qr(pivoting=True)``
  on the host.  The factorization runs once per layer-group on a ≤12288²
  matrix; LAPACK ``dgeqp3`` is the accuracy gold standard and the host hop
  is off the hot path (the hot path is calibration forwards + the
  quantization kernel, both on-device).
- ``backend="jax"``: an on-device float32 Businger–Golub pivoted QR with
  greedy norm pivoting, jit-compiled with a ``fori_loop`` over steps.  The
  trailing update is a rank-1 GEMM per step; column norms are recomputed
  from the updated trailing block each step (the fused masked reduction is
  cheap on TPU and avoids the classical downdating drift that dgeqp3 has
  to safeguard against).

Both return ``(r, perm)`` with ``a[:, perm] = q r`` (economic mode; ``q``
is never materialized — the solver only needs ``r`` and ``perm``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


def pivoted_qr(a, backend: str = "host"):
    """Economic pivoted QR of an (m, n) matrix.

    Returns (r, perm): r is (min(m,n), n) upper-trapezoidal with
    non-increasing |diag|, perm the column permutation.
    """
    if backend == "host":
        return _pivoted_qr_host(np.asarray(a))
    if backend == "jax":
        r, perm = _pivoted_qr_jax_impl(jnp.asarray(a, jnp.float32))
        return r, perm
    raise ValueError(f"unknown pivoted_qr backend {backend!r}")


def _pivoted_qr_host(a: np.ndarray):
    a64 = a.astype(np.float64, copy=False)
    r, perm = scipy.linalg.qr(a64, mode="r", pivoting=True)
    k = min(a.shape)
    return r[:k, :], perm.astype(np.int64)


@jax.jit
def _pivoted_qr_jax_impl(a: jax.Array):
    m, n = a.shape
    k = min(m, n)
    row_ids = jnp.arange(m)
    col_ids = jnp.arange(n)

    def step(j, carry):
        a, perm = carry
        # residual norms of columns >= j (rows >= j of current a)
        below = (row_ids[:, None] >= j).astype(a.dtype)
        norms = jnp.sum((a * below) ** 2, axis=0)
        p = jnp.argmax(jnp.where(col_ids >= j, norms, -jnp.inf))
        # swap columns j <-> p
        aj, ap = a[:, j], a[:, p]
        a = a.at[:, j].set(ap).at[:, p].set(aj)
        pj, pp = perm[j], perm[p]
        perm = perm.at[j].set(pp).at[p].set(pj)
        # Householder annihilating a[j+1:, j]
        colj = a[:, j]
        x = jnp.where(row_ids >= j, colj, 0.0)
        normx = jnp.linalg.norm(x)
        alpha = colj[j]
        sign = jnp.where(alpha >= 0, 1.0, -1.0)
        r0 = -sign * normx
        v = x.at[j].add(-r0)
        vnorm2 = jnp.sum(v * v)
        beta = jnp.where(vnorm2 > 0, 2.0 / jnp.maximum(vnorm2, 1e-30), 0.0)
        # reflect trailing block (including column j itself)
        w = beta * (v @ a)
        a = a - jnp.outer(v, w)
        # column j's subdiagonal is now ~0; set exactly for cleanliness
        a = a.at[:, j].set(jnp.where(row_ids < j, a[:, j], 0.0).at[j].set(r0))
        return a, perm

    a, perm = jax.lax.fori_loop(0, k, step, (a, jnp.arange(n, dtype=jnp.int32)))
    return jnp.triu(a[:k, :]), perm
