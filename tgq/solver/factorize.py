"""TruncGPTQ factorization: spectral truncation + pivoted QR ordering.

Reproduces the algorithmic content of the reference's three solver paths
(gptq_utils.py:33-165) with TPU-native structure:

- ``trunc_spectral_factor``  — mode "eigh": raw Hessian → f64 eigh →
  truncated S=Λ^½Vᵀ → pivoted QR of S for the column order → QR of the
  permuted Λ^{-½}Vᵀ for the error-propagation factor R with RᵀR ≈ H⁺.
- ``gptq_cholesky_factor``   — mode "gptq": damped Cholesky ladder,
  norm-ActOrder (the published GPTQ baseline).  The reference's latent
  NameError on total Cholesky failure (gptq_utils.py:147,162) is fixed.
- ``sketch_factor``          — mode "svd": same product from a randomized
  Gaussian sketch instead of the exact Hessian.

**Shape-static output.**  Instead of a (rank, n) trapezoid whose leading
dimension varies per layer (death by recompilation under jit), every path
returns a *full* (n, n) upper-triangular ``r_full`` in which rows beyond
the truncated rank are identity rows (unit diagonal, zero off-diagonal).
Feeding that to the blockwise quantization loop reproduces the reference's
semantics exactly — truncated-tail columns receive propagated error from
in-rank columns (via the trapezoid's cross block) but propagate nothing,
i.e. they degrade to round-to-nearest (reference gptq_utils.py:547-553) —
while keeping every downstream shape static.

Factorizations run on the host in f64 by default (TPUs have no f64; these
are once-per-layer-group calls on ≤12288² matrices, off the hot path).
``precision="f32"`` moves only the eigh to the device (f32 QDWH); the
pivoted QR / R build still runs on host f64 either way.  The fully
on-device production path is tgq.solver.pchol (mode "pchol"), which
needs no eigendecomposition at all.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from tgq.solver.pqr import pivoted_qr

logger = logging.getLogger(__name__)

EIG_FLOOR = 1e-12  # reference gptq_utils.py:94


@dataclasses.dataclass
class FactorResult:
    """Solver output consumed by the quantization loop.

    r_full: (n, n) f32 upper-triangular; rows >= rank are identity rows.
    perm:   (n,) int column permutation (quantization order).
    rank:   retained spectral rank (static Python int).
    r_x:    optional (n, n) factor of H^{1/2} in permuted order (rows past
            rank zero-padded), for relative-prediction-error diagnostics
            (reference R_x).
    """

    r_full: np.ndarray
    perm: np.ndarray
    rank: int
    r_x: Optional[np.ndarray] = None


def truncate_rank(s: np.ndarray, eps: float, method: str = "energy") -> int:
    """Rank selection on a descending spectrum (reference :97-108 semantics).

    - "energy": keep the smallest prefix whose cumulative s² reaches
      (1-eps) of the total.
    - "mean_trimmed": keep values above eps × mean(s[1:33]).
    - anything else: full rank.
    """
    s = np.asarray(s)
    n = len(s)
    if method == "energy":
        energy = s.astype(np.float64) ** 2
        target = (1.0 - eps) * energy.sum()
        rank = int((np.cumsum(energy) <= target).sum())
        if rank < n:
            rank += 1
    elif method == "mean_trimmed":
        ref_k = min(33, n)
        ref_val = s[1:ref_k].mean() if n > 1 else s[0]
        rank = int((s > eps * ref_val).sum())
    else:
        rank = n
    return max(1, min(rank, n))


def _finish_factor(
    s: np.ndarray, vh: np.ndarray, n: int, pqr_backend: str
) -> FactorResult:
    """Common tail: pivoted QR order from S·Vᵀ, propagation R from Λ^{-½}Vᵀ."""
    rank = s.shape[0]
    h_sqrt = s[:, None] * vh
    r_x, perm = pivoted_qr(h_sqrt, backend=pqr_backend)
    r_x = np.asarray(r_x)
    perm = np.asarray(perm)

    h_inv_partial = (1.0 / s)[:, None] * vh
    r_prime = scipy.linalg.qr(h_inv_partial[:, perm], mode="r")[0][:rank, :]

    # normalize both factors to positive diagonals (reference :121-124)
    dsign = np.sign(np.diagonal(r_prime)[:rank])
    dsign[dsign == 0] = 1.0
    r = r_prime * dsign[:, None]
    dsign_x = np.sign(np.diagonal(r_x)[:rank])
    dsign_x[dsign_x == 0] = 1.0
    r_x = r_x * dsign_x[:, None]

    r_full = np.zeros((n, n), dtype=np.float64)
    r_full[:rank, :] = r
    if rank < n:
        idx = np.arange(rank, n)
        r_full[idx, idx] = 1.0
    # pad r_x to (n, n) with zero rows so downstream shapes are rank-independent
    r_x_full = np.zeros((n, n), dtype=np.float32)
    r_x_full[:rank, :] = r_x.astype(np.float32)
    return FactorResult(
        r_full=r_full.astype(np.float32),
        perm=perm.astype(np.int64),
        rank=rank,
        r_x=r_x_full,
    )


def trunc_spectral_factor(
    h,
    eps: float = 5e-4,
    method: str = "mean_trimmed",
    precision: str = "f64",
) -> FactorResult:
    """TruncGPTQ solver (reference process_hessian_alt, gptq_utils.py:87-126).

    h: (n, n) symmetric PSD normalized Hessian (any array-like).
    """
    n = h.shape[0]
    if precision == "f64":
        h64 = np.asarray(h, dtype=np.float64)
        lam, v = scipy.linalg.eigh(h64)
        pqr_backend = "host"
    elif precision == "f32":
        lam_j, v_j = jnp.linalg.eigh(jnp.asarray(h, jnp.float32))
        lam, v = np.asarray(lam_j, np.float64), np.asarray(v_j, np.float64)
        pqr_backend = "host"  # pivot order still from host f64 (cheap, exact)
    else:
        raise ValueError(f"unknown precision {precision!r}")

    s = np.sqrt(np.clip(lam, EIG_FLOOR, None))[::-1]  # descending
    vh = v.T[::-1]
    rank = truncate_rank(s, eps, method)
    return _finish_factor(s[:rank], vh[:rank], n, pqr_backend)


def sketch_factor(
    y,
    eps: float = 1e-2,
    method: str = "mean_trimmed",
) -> FactorResult:
    """Randomized-sketch solver (reference process_sketch, gptq_utils.py:33-84).

    y: (sketch_rank, n) scaled Gaussian sketch of the activations.
    """
    y64 = np.asarray(y, dtype=np.float64)
    n = y64.shape[1]
    r_reduced = scipy.linalg.qr(y64, mode="r")[0][: min(y64.shape), :]
    _, s, vh = scipy.linalg.svd(r_reduced, full_matrices=False)
    rank = truncate_rank(s, eps, method)
    return _finish_factor(s[:rank], vh[:rank], n, "host")


def gptq_cholesky_factor(
    h,
    actorder: bool = False,
    damp_percent: float = 0.01,
) -> FactorResult:
    """Reference-GPTQ solver (process_hessian, gptq_utils.py:129-165):
    norm ActOrder + escalating damped Cholesky; identity fallback.
    """
    h64 = np.asarray(h, dtype=np.float64)
    n = h64.shape[0]
    if actorder:
        perm = np.argsort(np.diagonal(h64))[::-1].copy()
        h64 = h64[perm][:, perm]
    else:
        perm = np.arange(n)

    diag_mean = float(np.diagonal(h64).mean())
    if diag_mean == 0.0:
        diag_mean = 1.0

    u = None
    for damp_exp in range(5):
        damp = 10**damp_exp * damp_percent
        h_damped = h64.copy()
        h_damped[np.diag_indices(n)] += damp * diag_mean
        try:
            low = scipy.linalg.cholesky(h_damped, lower=True)
            h_inv = scipy.linalg.cho_solve((low, True), np.eye(n))
            u = scipy.linalg.cholesky(h_inv, lower=False)  # upper U: H'⁻¹ = UᵀU
            if damp_exp > 0:
                logger.info("ref-GPTQ required high damping: %s", damp)
            break
        except np.linalg.LinAlgError:
            continue

    if u is None:
        logger.warning("Hessian singular beyond damping ladder; identity fallback")
        u = np.eye(n)

    return FactorResult(
        r_full=np.ascontiguousarray(u, dtype=np.float32),
        perm=perm.astype(np.int64),
        rank=n,
        r_x=None,
    )
