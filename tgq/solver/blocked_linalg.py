"""Blocked dense linear algebra with bounded temp memory.

XLA:TPU's monolithic ``cholesky`` / ``triangular_solve`` allocate HLO
temps that scale with the full matrix (observed: >9 GB of 456 MB temp
tiles for a 12288² factor/solve on a 16 GB v5e — they OOM exactly when a
model layer and calibration set are co-resident).  These panel-blocked
versions issue a sequence of small ops (panel chol, panel-wide
triangular solve, trailing MXU GEMM), so peak temp memory is
O(panel × n) instead of O(n²)-times-constant, while the flops stay on
the MXU.  Eager per-op dispatch (a dozen panels) costs microseconds and
keeps every individual op's working set small.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from tgq.utils.precision import best_f32_dot_precision

_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=best_f32_dot_precision(),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def _chol_small_lower(a):
    return jsl.cholesky(a, lower=True)


@jax.jit
def _panel_step_lower(a11, a21):
    """One right-looking panel: (L11, L21, L21·L21ᵀ update)."""
    l11 = jsl.cholesky(a11, lower=True)
    # L21 = A21 L11⁻ᵀ  ⇔  solve L11 X = A21ᵀ then transpose
    l21 = jsl.solve_triangular(l11, a21.T, lower=True).T
    return l11, l21, _dot(l21, l21.T)


def blocked_cholesky_lower(a: jax.Array, block: int = 2048) -> jax.Array:
    """Lower-triangular Cholesky of an (n, n) SPD matrix, panel-blocked."""
    n = a.shape[0]
    if n <= block:
        return _chol_small_lower(a)
    out = jnp.zeros_like(a)
    for j in range(0, n, block):
        b = min(block, n - j)
        a11 = a[j : j + b, j : j + b]
        if j + b < n:
            a21 = a[j + b :, j : j + b]
            l11, l21, upd = _panel_step_lower(a11, a21)
            a = a.at[j + b :, j + b :].add(-upd)
            out = out.at[j + b :, j : j + b].set(l21)
        else:
            l11 = _chol_small_lower(a11)
        out = out.at[j : j + b, j : j + b].set(jnp.tril(l11))
    return out


def blocked_cholesky_upper(a: jax.Array, block: int = 2048) -> jax.Array:
    """Upper-triangular Cholesky: A = RᵀR with R upper."""
    return blocked_cholesky_lower(a, block=block).T


def solve_lower_chunked(l: jax.Array, b: jax.Array, chunk: int = 2048,
                        trans: bool = False) -> jax.Array:
    """solve L X = B (or LᵀX = B) with the RHS split into column chunks
    so XLA's triangular-solve temps stay bounded."""

    @jax.jit
    def _solve(l, rhs):
        return jsl.solve_triangular(l, rhs, lower=True, trans=1 if trans else 0)

    n = b.shape[1]
    if n <= chunk:
        return _solve(l, b)
    return jnp.concatenate(
        [_solve(l, b[:, j : j + chunk]) for j in range(0, n, chunk)], axis=1
    )


def cho_solve_chunked(l: jax.Array, b: jax.Array, chunk: int = 2048) -> jax.Array:
    """A⁻¹B from A = LLᵀ, chunked on the RHS."""
    y = solve_lower_chunked(l, b, chunk=chunk)
    return solve_lower_chunked(l, y, chunk=chunk, trans=True)


@jax.jit
def _tri_inv_small(l):
    return jsl.solve_triangular(l, jnp.eye(l.shape[0], dtype=l.dtype),
                                lower=True)


@jax.jit
def _tri_inv_offdiag(x_ii, l_strip, x_strip):
    """X[i,j] = -X[i,i] · (L[i, j:i] · X[j:i, j]) — two MXU GEMMs."""
    return -_dot(x_ii, _dot(l_strip, x_strip))


def blocked_triangular_inverse_lower(l: jax.Array, block: int = 1024
                                     ) -> jax.Array:
    """L⁻¹ for lower-triangular L, block-column algorithm.

    XLA:TPU's ``triangular_solve`` runs its substitution essentially
    serially (measured 3.5 s for a 12288² solve pair on v5e); the
    explicit blocked inverse is n³/3 flops of MXU GEMMs plus nb small
    diagonal-block solves, after which any solve is a GEMM.  f32 with
    HIGHEST-precision accumulation; fine for κ(L)² ≲ 1/pivot_rtol.
    """
    n = l.shape[0]
    if n <= block:
        return _tri_inv_small(l)
    bounds = list(range(0, n, block)) + [n]
    nb = len(bounds) - 1
    xd = [_tri_inv_small(l[bounds[i]:bounds[i + 1], bounds[i]:bounds[i + 1]])
          for i in range(nb)]
    x = jnp.zeros_like(l)
    for i in range(nb):
        x = x.at[bounds[i]:bounds[i + 1], bounds[i]:bounds[i + 1]].set(xd[i])
    for j in range(nb):
        j0, j1 = bounds[j], bounds[j + 1]
        for i in range(j + 1, nb):
            i0, i1 = bounds[i], bounds[i + 1]
            xij = _tri_inv_offdiag(xd[i], l[i0:i1, j0:i0], x[j0:i0, j0:j1])
            x = x.at[i0:i1, j0:j1].set(xij)
    return x


def cho_solve_gemm(l: jax.Array, b: jax.Array, block: int = 1024) -> jax.Array:
    """A⁻¹B from A = LLᵀ as pure GEMMs: L⁻ᵀ(L⁻¹B) with an explicit
    blocked triangular inverse — ~10× faster than chunked
    ``triangular_solve`` on TPU for n ≳ 4096."""
    linv = blocked_triangular_inverse_lower(l, block=block)
    return _dot(linv.T, _dot(linv, b))
