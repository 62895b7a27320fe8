"""Pallas TPU kernel: one panel of greedy pivoted Cholesky.

The sweep in tgq.solver.pchol is n sequential pivot steps; each step is
cheap vector work (argmax, one Schur-row build, diagonal downdate) but
as an XLA ``fori_loop`` it pays ~36 µs/step of per-iteration op overhead
— identical at n=4096 and n=12288, i.e. pure loop overhead, not compute
(measured on v5e).  This kernel runs a whole ``panel`` of steps inside
one Pallas program with everything hot in VMEM:

- the panel strip (panel × n) lives in VMEM for the whole kernel; the
  per-step "deferred Schur row" is one (1,panel)×(panel,n) MXU matvec
  against it;
- the source matrix ``a`` (n × n) stays in HBM; each step DMAs only the
  pivot row (n floats, data-dependent index — ``make_async_copy`` with a
  dynamic sublane slice);
- pivot selection is a lane-reduction argmax (max + first-match-index,
  matching ``jnp.argmax`` tie-breaking);
- d / done / perm / trace histories ride the ``fori_loop`` carry as
  (1, n) / (1, panel) vregs.

The trailing Schur update ``a -= stripᵀ·strip`` stays outside in XLA
(one MXU GEMM per panel) — same decomposition as the jnp path.  Both
backends produce valid factorizations of the same H (reconstruction
error ~3e-6 f32); pivot *orders* can diverge where conditional variances
are within reduction-order noise of each other (near-ties), which
permutes equivalent columns and does not affect quantization quality
(interpret-mode CPU tests assert exact pivot parity, where both paths
share XLA's reduction order).

Measured on v5e at n=12288: 0.35 s vs 0.46 s for the XLA fori_loop
sweep.  The remaining ~20 µs/step is scalar plumbing (vector→sreg pivot
extraction, DMA setup) — inherent to data-dependent pivoting.

Reference counterpart: none — the reference's pivoted QR runs in Magma
on the GPU (gptq_utils.py:114, README.md:107).  This kernel is what
makes the eigh/Magma-free TruncGPTQ factorization TPU-native end to end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pchol_panel_kernel(a_ref, d_ref, done_ref,
                        strip_ref, d_out, done_out, perm_ref, ph_ref,
                        row_buf, sem, *, panel: int):
    n = d_ref.shape[1]
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, panel), 1)
    strip_ref[:] = jnp.zeros_like(strip_ref)

    def body(k, carry):
        d, done, perm, ph = carry
        dm = jnp.where(done > 0, -jnp.inf, d)
        m = jnp.max(dm)
        piv = jnp.min(jnp.where(dm == m, lane_n, n)).astype(jnp.int32)
        dk = jnp.maximum(m, 0.0)
        # DMA the 8-sublane-aligned row group holding the pivot row (HBM
        # slices must be tile-aligned in dim 0), select the row in VMEM
        base = pl.multiple_of((piv // 8) * 8, 8)
        copy = pltpu.make_async_copy(a_ref.at[pl.ds(base, 8), :], row_buf, sem)
        copy.start()
        onehot = lane_n == piv
        strip_all = strip_ref[:]  # rows >= k are still zero
        # column piv of the strip: masked lane-reduction (VPU)
        s_col = jnp.sum(jnp.where(onehot, strip_all, 0.0), axis=1)  # (panel,)
        # deferred-update Schur row correction s_colᵀ·strip — as a VPU
        # broadcast-multiply + sublane reduction, overlapped with the
        # row DMA.  This replaced an M=1 MXU matvec at HIGHEST (the
        # 6-pass form needed because Mosaic's default f32 matmul
        # truncates to bf16 and derails pivot selection at ~1e-3):
        # single-row MXU work is pipeline-latency-bound, and the VPU
        # form is EXACT f32 — measured 1.7× on the whole sweep
        # (r5; see RESULTS.md factorize).
        row_sub = jnp.sum(s_col[:, None] * strip_all, axis=0,
                          keepdims=True)
        copy.wait()
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == piv % 8
        a_row = jnp.sum(jnp.where(sub, row_buf[:], 0.0), axis=0,
                        keepdims=True)  # (1, n)
        row = a_row - row_sub
        inv = jnp.where(dk > 0, jax.lax.rsqrt(jnp.maximum(dk, 1e-30)), 0.0)
        l = row * inv
        l = jnp.where(done > 0, 0.0, l)
        l = jnp.where(onehot, jnp.sqrt(dk), l)
        strip_ref[pl.ds(k, 1), :] = l
        ll = l * l
        perm = jnp.where(lane_b == k, piv, perm)
        ph = jnp.where(lane_b == k, dk, ph)
        done = jnp.maximum(done, onehot.astype(done.dtype))
        d = jnp.where(done > 0, 0.0, jnp.maximum(d - ll, 0.0))
        return d, done, perm, ph

    init = (d_ref[:], done_ref[:],
            jnp.zeros((1, panel), jnp.int32),
            jnp.zeros((1, panel), jnp.float32))
    d, done, perm, ph = jax.lax.fori_loop(0, panel, body, init)
    d_out[:] = d
    done_out[:] = done
    perm_ref[:] = perm
    ph_ref[:] = ph


@functools.partial(jax.jit, static_argnames=("panel", "interpret"))
def pchol_panel(a: jax.Array, d: jax.Array, done: jax.Array,
                panel: int = 128, interpret: bool = False):
    """Run ``panel`` greedy pivot steps against the Schur complement ``a``.

    a:    (n, n) f32, the Schur complement as of the panel start (HBM).
    d:    (1, n) f32 current conditional variances (0 at spent pivots).
    done: (1, n) f32 spent-pivot mask (1.0 = spent).

    Returns (strip (panel, n), d', done', perm (1, panel) i32,
    pivhist (1, panel)).  The per-step trace history dhist[k] = ‖l_k‖²
    is NOT computed in-kernel: every (1, n)-shaped op inside the step
    loop costs ~2 µs of serial vector-issue overhead (r5 ablation — the
    dominant per-step cost), so the wrapper computes it from the strip
    with one XLA reduction per panel instead.
    """
    n = a.shape[0]
    kernel = functools.partial(_pchol_panel_kernel, panel=panel)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # a stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((panel, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, panel), jnp.int32),
            jax.ShapeDtypeStruct((1, panel), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, n), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(a, d, done)
