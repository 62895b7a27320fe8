"""Blocked pivoted Cholesky — the TPU-native TruncGPTQ solver fast path.

The reference's solver chain (f64 eigh → truncate → Magma pivoted QR of
Λ^½Vᵀ → QR of Λ^{-½}Vᵀ, gptq_utils.py:87-126) leans on dense
eigendecomposition, which XLA:TPU implements iteratively (QDWH) and
slowly (~4 s at 4096², ~2 min at 12288² in f32).  This module replaces
the whole chain with operations TPU executes at MXU speed, using two
identities:

1. The reference's "energy" truncation keeps the smallest eigenbasis
   prefix capturing (1-ε) of Σλ — a **trace fraction** (its ``energy``
   variable is S² = λ).  Greedy pivoted Cholesky decomposes the trace
   exactly the same way: step k removes ‖l_k‖² from tr(Schur complement)
   (the eigh analog is λ_k), so "stop when the cumulative captured trace
   reaches (1-ε)·tr(H)" is the same criterion on the same quantity.
2. The Businger–Golub pivots of a pivoted QR of any S with SᵀS = H are
   *identical* to the diagonal pivots of pivoted Cholesky of H (the QR
   residual column norms² are the Cholesky Schur-complement diagonal).
   So the column ordering — the point of the Magma dependency — comes
   straight out of the same factorization.

The factorization below is right-looking with panel-deferred Schur
updates: within a panel of ``panel`` steps only O(n·panel) work per step
(row reads, one-hot column extraction, D downdating — all native VPU
ops), then one (panel × n)ᵀ(panel × n) MXU GEMM updates the Schur
complement.  No physical column swaps: pivoting is tracked logically and
columns are gathered once at the end, so nothing ever indexes a dynamic
lane.  Everything is shape-static: the loop always runs n steps; spent
pivots have conditional variance 0 and their rows are masked to zero.

From (Lt, perm, rank) the GPTQ factors follow with chol/solves/GEMMs
only (see ``pchol_factor``): R_x = Lt in permuted order (RᵀR_x = H_perm),
and the error-propagation factor R with RᵀR = H⁺_perm from the block
identity H⁺ = Lp G⁻² Lpᵀ (G = LpᵀLp), P11 = L1G⁻²L1ᵀ → R1 = chol(P11),
R12 = R1⁻ᵀ(L1G⁻²L2ᵀ).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from tgq.solver.factorize import FactorResult
from tgq.utils.precision import best_f32_dot_precision

_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=best_f32_dot_precision(),
        preferred_element_type=jnp.float32,
    )


def _dot_schur(a, b):
    """Exact-f32 (HIGHEST) dot for the SWEEP's Schur updates.

    The sweep's pivot resolution is set by the precision of the Schur
    complement: with the X3 (3-pass bf16) GEMMs the accumulated noise
    floor sits near 1e-4 of the TOP pivot, and on outlier-dominated
    spectra (real-LLM Hessians: channel variances spanning 1e4) that
    floor swallowed the ENTIRE bulk — measured r5: rank collapsed
    735 → 8 and quantization quality degraded 20 % vs eigh.  HIGHEST
    Schur updates restore the exact-f32 floor (~√n·eps ≈ 1e-5 of top at
    12288) at no measurable sweep cost (0.245 → 0.251 s at 12288²: the
    sweep is latency-bound, not GEMM-bound), fix rank-deficient
    detection at tight rtol (a rank-20 matrix reads exactly 20 down to
    rtol 1e-6, where the X3 floor used to read ≈ n), and bring TPU
    quality to parity with the CPU path (err ratio vs eigh 0.94).  The
    factor BUILD keeps X3 (`_dot`): its output feeds quantization with
    a ~1e-2 noise tolerance."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("panel",))
def _pivoted_cholesky_jit(h: jax.Array, panel: int = 128):
    """Full-length greedy pivoted Cholesky.

    Returns (lt, perm, d_hist):
      lt:     (n, n) f32 — row k is the k-th Cholesky vector in ORIGINAL
              column indexing (gather by perm to get the trapezoid).
      perm:   (n,) int32 pivot order.
      d_hist: (n,) f32 trace captured at each step, ‖l_k‖² — an exact
              decomposition of tr(H), used for truncation.
    """
    n = h.shape[0]
    a = h.astype(jnp.float32)
    lt = jnp.zeros((n, n), jnp.float32)
    perm = jnp.zeros((n,), jnp.int32)
    dhist = jnp.zeros((n,), jnp.float32)
    pivhist = jnp.zeros((n,), jnp.float32)
    d = jnp.diagonal(a)
    done = jnp.zeros((n,), bool)
    col_ids = jnp.arange(n)

    num_panels = -(-n // panel)
    for p in range(num_panels):
        lo, hi = p * panel, min((p + 1) * panel, n)
        b = hi - lo
        strip = jnp.zeros((b, n), jnp.float32)  # this panel's Lt rows

        def panel_step(k, carry, lo=lo, b=b):
            a, strip, perm, dhist, pivhist, d, done = carry
            kk = k - lo
            dm = jnp.where(done, -jnp.inf, d)
            piv = jnp.argmax(dm).astype(jnp.int32)
            dk = jnp.maximum(dm[piv], 0.0)
            onehot = (col_ids == piv).astype(jnp.float32)
            # row piv of the panel-deferred Schur complement:
            #   a[piv,:] - Σ_{t<kk in panel} strip[t,piv]·strip[t,:]
            strip_col_piv = _dot(strip, onehot)          # (b,)
            row = a[piv, :] - _dot(strip_col_piv, strip)  # (n,)
            inv_sqrt = jnp.where(dk > 0, jax.lax.rsqrt(jnp.maximum(dk, 1e-30)), 0.0)
            l = row * inv_sqrt
            l = jnp.where(done, 0.0, l)
            l = l * (1.0 - onehot) + onehot * jnp.sqrt(jnp.maximum(dk, 0.0))
            strip = jax.lax.dynamic_update_slice_in_dim(strip, l[None, :], kk, 0)
            perm = perm.at[k].set(piv)
            # trace captured by this step: tr(A) drops by ‖l‖² (the eigh
            # analog is λ_k) — this is what trace-fraction truncation uses
            dhist = dhist.at[k].set(jnp.sum(l * l))
            pivhist = pivhist.at[k].set(dk)
            done = done | (col_ids == piv)
            d = jnp.where(done, 0.0, jnp.maximum(d - l * l, 0.0))
            return a, strip, perm, dhist, pivhist, d, done

        a, strip, perm, dhist, pivhist, d, done = jax.lax.fori_loop(
            lo, hi, panel_step, (a, strip, perm, dhist, pivhist, d, done)
        )
        # fold the finished panel into the Schur complement (one MXU
        # GEMM, exact f32 — see _dot_schur)
        a = a - _dot_schur(strip.T, strip)
        lt = jax.lax.dynamic_update_slice_in_dim(lt, strip, lo, 0)
    return lt, perm, dhist, pivhist


@partial(jax.jit, donate_argnums=(0,))
def _apply_panel(a, strip):
    return a - _dot_schur(strip.T, strip)


@jax.jit
def _copy_f32(h):
    return h.astype(jnp.float32) + 0.0  # fresh buffer (donation-safe)


@partial(jax.jit, static_argnames=("panel", "interpret"))
def _pivoted_cholesky_pallas(h: jax.Array, panel: int = 128,
                             interpret: bool = False):
    """Pallas-panel sweep — same contract as _pivoted_cholesky_jit.

    Each 128-step panel runs as one VMEM-resident kernel
    (tgq.kernels.pchol_panel); the trailing Schur update stays an XLA MXU
    GEMM.  The whole panel chain is one jit (one dispatch) — eager
    per-panel launches cost ~2-4 ms each through the runtime."""
    from tgq.kernels.pchol_panel import pchol_panel

    n = h.shape[0]
    a = h.astype(jnp.float32)
    d = jnp.diagonal(a)[None, :]
    done = jnp.zeros((1, n), jnp.float32)
    strips, perms, dhs, phs = [], [], [], []
    num_panels = n // panel
    for p in range(num_panels):
        strip, d, done, perm, ph = pchol_panel(
            a, d, done, panel=panel, interpret=interpret)
        if p + 1 < num_panels:
            a = a - _dot_schur(strip.T, strip)
        strips.append(strip)
        perms.append(perm)
        # dhist[k] = ‖l_k‖² — computed here (one XLA reduction per
        # panel) instead of in-kernel, where it cost a serial (1, n)
        # reduction every step (r5 ablation)
        dhs.append(jnp.sum(strip * strip, axis=1)[None, :])
        phs.append(ph)
    lt = jnp.concatenate(strips, axis=0)
    perm = jnp.concatenate(perms, axis=1)[0]
    dhist = jnp.concatenate(dhs, axis=1)[0]
    pivhist = jnp.concatenate(phs, axis=1)[0]
    return lt, perm, dhist, pivhist


def _uses_pallas_sweep(n: int, panel: int) -> bool:
    """True when _sweep will run the Pallas panel kernel, whose Schur
    updates use BF16_BF16_F32_X3 MXU arithmetic (vs the jit sweep's
    exact f32) — the pivot-noise floor differs by ~100x between them."""
    return (jax.default_backend() == "tpu" and panel == 128
            and n % 128 == 0 and n >= 256)


def _sweep(h: jax.Array, panel: int):
    """Backend-selected pivoted-Cholesky sweep."""
    n = h.shape[0]
    if _uses_pallas_sweep(n, panel):
        return _pivoted_cholesky_pallas(h, panel=panel)
    return _pivoted_cholesky_jit(h, panel=panel)


def pivoted_cholesky(h, panel: int = 128):
    """Host-friendly wrapper; see _pivoted_cholesky_jit.  Returns
    (lt, perm, trace_hist) — use pchol_factor for the full solver."""
    lt, perm, dhist, _ = _sweep(jnp.asarray(h), panel=panel)
    return lt, perm, dhist


@jax.jit
def _rank_on_device(dhist, pivhist, eps, pivot_rtol):
    """Device mirror of ``trace_rank`` + the pivot_rtol numerical-rank
    guard — lets the TPU path dispatch the factor build without a host
    round-trip (see pchol_factor).  f32 cumsum vs the host's f64 can
    differ by ±1 rank on an exact threshold tie; otherwise identical."""
    d = dhist.astype(jnp.float32)
    total = jnp.sum(d)
    cs = jnp.cumsum(d)
    tr = jnp.sum((cs <= (1.0 - eps) * total).astype(jnp.int32))
    tr = jnp.where(tr < d.shape[0], tr + 1, tr)
    tr = jnp.clip(tr, 1, jnp.maximum(jnp.sum((d > 0).astype(jnp.int32)), 1))
    p = pivhist.reshape(-1)
    nr = jnp.maximum(
        jnp.sum((p > pivot_rtol * p[0]).astype(jnp.int32)), 1)
    rank = jnp.minimum(tr, nr)
    return jnp.where(total <= 0, 1, rank).astype(jnp.int32)


def trace_rank(d_hist: np.ndarray, eps: float) -> int:
    """Smallest prefix capturing (1-eps) of the trace (the reference's
    "energy" rule applied to the pivoted-Cholesky trace decomposition)."""
    d = np.asarray(d_hist, np.float64)
    total = d.sum()
    if total <= 0:
        return 1
    rank = int((np.cumsum(d) <= (1.0 - eps) * total).sum())
    if rank < len(d):
        rank += 1
    return max(1, min(rank, int((d > 0).sum()) or 1))


# The factor build runs fused in one jit by default.  Historically it
# had to run as a chain of small donated jits: with XLA's monolithic
# triangular_solve in the chain, the fused version asked for >12 GB of
# HLO temps and OOMed a 16 GB v5e.  The all-GEMM blocked triangular
# inverse removed those temps; fused peak is now ~4 GB at n=12288 and
# ~30 % faster than the eager chain (fewer dispatches through the
# runtime).  The eager chain is kept as the low-memory fallback, used
# automatically if the fused call OOMs.


@partial(jax.jit, donate_argnums=(0,))
def _pf_gather(lt, perm, rank):
    mask_r = (jnp.arange(lt.shape[0]) < rank).astype(lt.dtype)
    a = lt[:, perm] * mask_r[:, None]       # (n, n), rows >= rank zeroed
    return a, mask_r


@jax.jit
def _pf_gram(a, mask_r):
    return _dot(a, a.T) + jnp.diag(1.0 - mask_r)  # [[LpᵀLp, 0], [0, I]]


@partial(jax.jit, donate_argnums=(0,))
def _pf_gram2(k, mask_r):
    return _dot(k.T, k) + jnp.diag(1.0 - mask_r)  # H⁺_perm + I_tail


@partial(jax.jit, static_argnames=("want_rx",), donate_argnums=(0,))
def _pchol_factors_fused(lt: jax.Array, perm: jax.Array, rank: jax.Array,
                         want_rx: bool = True):
    """One-jit factor build (see _pchol_factors_jit for the math)."""
    from tgq.solver.blocked_linalg import (blocked_cholesky_lower,
                                           blocked_cholesky_upper,
                                           cho_solve_gemm)

    a, mask_r = _pf_gather(lt, perm, rank)
    g = _pf_gram(a, mask_r)
    cg = blocked_cholesky_lower(g)
    k = cho_solve_gemm(cg, a)
    p = _pf_gram2(k, mask_r)
    r_full = jnp.triu(blocked_cholesky_upper(p))
    return r_full, (a if want_rx else None)


def _pchol_factors_jit(lt: jax.Array, perm: jax.Array, rank: jax.Array,
                       want_rx: bool = True):
    """From Lt (original indexing) + traced rank build (r_full, r_x)
    entirely on-device, shape-static in everything including the rank.

    With A := rows<rank of lt[:, perm]  (Lpᵀ zero-padded to n×n) and
    G := AAᵀ + I_tail, K := G⁻¹A has KᵀK = H⁺_perm =: P *exactly* rank r
    with invertible P11, so its tail Schur complement is zero and

        chol_upper(P + I_tail) = [[R1, R12], [0, I]]

    — precisely the full-width triangular factor the quantization loop
    wants (identity tail rows ⇒ RTN tail, cross-block preserved).
    """
    from tgq.solver.blocked_linalg import blocked_cholesky_lower, cho_solve_gemm

    a, mask_r = _pf_gather(lt, perm, rank)
    g = _pf_gram(a, mask_r)
    cg = blocked_cholesky_lower(g)
    del g
    k = cho_solve_gemm(cg, a)
    del cg
    if not want_rx:
        del a
        a = None
    p = _pf_gram2(k, mask_r)
    from tgq.solver.blocked_linalg import blocked_cholesky_upper

    r_full = jnp.triu(blocked_cholesky_upper(p))
    return r_full, a


def pchol_factor(
    h, eps: float = 1e-6, panel: int = 128, pivot_rtol: float = None,
    want_rx: bool = True, force_finite_check: bool = False,
) -> FactorResult:
    """TruncGPTQ factorization via pivoted Cholesky (TPU fast path).

    Same FactorResult contract as trunc_spectral_factor: full (n, n)
    upper-triangular r_full with identity tail rows, pivot-order perm,
    r_x with R_xᵀR_x ≈ H_perm for diagnostics.

    ``pivot_rtol``: numerical-rank guard — pivots below rtol × the first
    pivot are unresolvable by the sweep's arithmetic (LAPACK pstrf-style
    breakdown stop); columns beyond that degrade to RTN regardless of
    ``eps``.  Both sweeps now run exact-f32 Schur updates (r5,
    `_dot_schur` — the r3/r4 bf16-X3 updates collapsed the rank on
    outlier-dominated spectra and forced a 1e-4 guard), so the default
    is **1e-5** for the Pallas panel kernel (the f32 accumulation floor
    ~√n·eps of the top pivot at 12288; measured on-chip r5: quality vs
    eigh ratio 0.94 on a 1e4-outlier channel spectrum, and a truly
    rank-20 matrix reads exactly 20) and **1e-6** for the jit sweep
    (CPU and off-tile shapes).
    """
    h = jnp.asarray(h)
    n = h.shape[0]
    use_pallas = _uses_pallas_sweep(n, panel)
    if pivot_rtol is None:
        pivot_rtol = 1e-5 if use_pallas else 1e-6
    lt, perm, dhist, pivhist = _sweep(h, panel=panel)
    if use_pallas:
        # TPU hot path: compute the rank ON DEVICE and dispatch the
        # factor build BEFORE any host fetch.  The old order (fetch
        # pivhist → host rank → dispatch) left the chip idle for a full
        # tunnel round-trip per layer-group while the host decided a
        # number the device could compute itself; now the build queues
        # behind the sweep and the host's pivhist/rank fetch overlaps
        # with it.  Device f32 cumsum can differ from the host's f64 by
        # ±1 rank at an exact threshold tie — immaterial (rank of
        # thousands) and the returned FactorResult.rank is the rank the
        # factor was actually built with.  Host semantics are kept
        # bit-exact on the CPU/jnp path below (parity tests).
        rank_dev = _rank_on_device(dhist, pivhist, jnp.float32(eps),
                                   jnp.float32(pivot_rtol))
        try:
            r_full, r_x = _pchol_factors_fused(lt, perm, rank_dev,
                                               want_rx=want_rx)
        except jax.errors.JaxRuntimeError:
            lt, _, _, _ = _sweep(h, panel=panel)
            r_full, r_x = _pchol_factors_jit(lt, perm, rank_dev,
                                             want_rx=want_rx)
        pivhist = np.asarray(pivhist, np.float64)  # sweep done; build runs
        if pivhist[0] <= 0.0:
            return FactorResult(
                r_full=np.eye(n, dtype=np.float32),
                perm=np.arange(n, dtype=np.int64),
                rank=1,
                r_x=np.zeros((n, n), np.float32),
            )
        rank = int(rank_dev)
        if rank < 1:
            rank = 1
    else:
        pivhist = np.asarray(pivhist, np.float64)
        if pivhist[0] <= 0.0:
            # degenerate Hessian (all-zero trace): identity fallback —
            # every column quantizes RTN (mirrors the reference's
            # identity fallback, gptq_utils.py:162-164)
            return FactorResult(
                r_full=np.eye(n, dtype=np.float32),
                perm=np.arange(n, dtype=np.int64),
                rank=1,
                r_x=np.zeros((n, n), np.float32),
            )
        num_rank = int((pivhist > pivot_rtol * pivhist[0]).sum())
        rank = min(trace_rank(np.asarray(dhist), eps), max(num_rank, 1))
        # factor build stays on device; rank is traced (one compile
        # per width)
        try:
            r_full, r_x = _pchol_factors_fused(lt, perm, jnp.int32(rank),
                                               want_rx=want_rx)
        except jax.errors.JaxRuntimeError:
            # fused build OOMed (lt was donated into the failed call —
            # redo the sweep) → low-memory eager chain
            lt, _, _, _ = _sweep(h, panel=panel)
            r_full, r_x = _pchol_factors_jit(lt, perm, jnp.int32(rank),
                                             want_rx=want_rx)
    # f32 breakdown guard: on extreme spectra (cond ≳ 1e9 — retained
    # pivots spanning more than the triangular solves' f32 range) the
    # factor build goes all-NaN (measured on a 5-decade synthetic
    # spectrum).  The eager isfinite fetch is a BLOCKING host sync that
    # costs ~0.2 s/layer of lost pipeline overlap on the 8B bench, so
    # it only runs when the (already host-resident) pivot history says
    # breakdown is even possible: retained dynamic range > 1e4 — which
    # the device sweep's pivot_rtol=1e-4 floor makes impossible, so the
    # hot path never syncs.  On breakdown: escalate the numerical-rank
    # guard once (tail columns degrade to RTN), then fall back to the
    # host-f64 eigh parity path — the same failure-ladder shape as the
    # reference's damping escalation (gptq_utils.py:148-164).
    pivot_ratio = pivhist[0] / max(float(pivhist[rank - 1]), 1e-300)
    if force_finite_check or pivot_ratio > 1e4:
        # force_finite_check: the escalated retry below restricts the
        # retained pivot ratio under the 1e4 gate *by construction*, so
        # without the flag a retry that NaNs for any other reason would
        # return NaN factors silently instead of falling through to the
        # host-f64 eigh parity path (advisor r4)
        finite = bool(jnp.isfinite(r_full).all()) and (
            r_x is None or bool(jnp.isfinite(r_x).all()))
        if not finite:
            if pivot_rtol < 1e-3:
                return pchol_factor(h, eps=eps, panel=panel,
                                    pivot_rtol=1e-3, want_rx=want_rx,
                                    force_finite_check=True)
            from tgq.solver.factorize import trunc_spectral_factor

            return trunc_spectral_factor(np.asarray(h, np.float64),
                                         eps=eps, method="energy")
    return FactorResult(r_full=r_full, perm=perm, rank=rank, r_x=r_x)
