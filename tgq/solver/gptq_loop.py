"""Blockwise column-sequential GPTQ quantization loop (on-device, jitted).

The reference runs this as a Triton GPU kernel per 1024-column block with
cuBLAS inter-block propagation (gptq_utils.py:459-565).  The TPU design
keeps the same two-level decomposition — it is the right one on TPU too:

- **in-block**: sequential loop over columns; quantize column k, compute
  the scaled error e = (w - q̂)/R[k,k], propagate e·R[k, k+1:B] to the
  remaining in-block columns.  Runs fully on-device: either a jnp
  ``lax.fori_loop`` (oracle, this file) or the Pallas kernel
  (tgq.kernels.gptq_block) that keeps the whole block resident in VMEM.
- **inter-block**: one MXU GEMM ``W[:, i2:] -= E_block @ R[i1:i2, i2:]``
  at HIGHEST precision (the reference disables TF32 for the same reason,
  gptq_utils.py:474).

Because the factorization hands us a full (n, n) upper-triangular R whose
beyond-rank rows are identity rows (see tgq.solver.factorize), a single
shape-static pass over all n columns covers both the in-rank GPTQ columns
and the reference's RTN tail (gptq_utils.py:547-553) — no dynamic shapes,
one compilation per (m, n, spec).

Outputs both integer codes (for packed export — the reference can't, its
loop only produces dequantized values) and the dequantized weight.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from tgq.core.quant import QuantSpec, expand_params, find_params, round_half_up
from tgq.solver.factorize import FactorResult

_HIGHEST = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizeResult:
    codes: jax.Array      # (m, n) int32 quantization codes, original column order
    w_q: jax.Array        # (m, n) f32 dequantized weight, original column order
    scale: jax.Array      # (m, n_groups) f32
    zero: jax.Array       # (m, n_groups) f32
    rel_error: jax.Array  # scalar f32: ‖(W−Wq)R_xᵀ‖/‖W R_xᵀ‖, nan if no R_x


def _process_block_jnp(w, s, z, r, min_q: int, max_q: int):
    """Sequential in-block loop, jnp oracle.

    w, s, z: (m, b) permuted weight/scale/zero block
    r:       (b, b) upper-triangular propagation block
    Returns (codes (m,b), e_scaled (m,b)) where e_scaled[:,k] = (w-q̂)/r[k,k].
    """
    m, b = w.shape
    cols = jnp.arange(b)

    def body(k, carry):
        w, q, e = carry
        wk = jax.lax.dynamic_slice_in_dim(w, k, 1, axis=1)[:, 0]
        sk = jax.lax.dynamic_slice_in_dim(s, k, 1, axis=1)[:, 0]
        zk = jax.lax.dynamic_slice_in_dim(z, k, 1, axis=1)[:, 0]
        rk = jax.lax.dynamic_slice_in_dim(r, k, 1, axis=0)[0]
        d = jax.lax.dynamic_slice(r, (k, k), (1, 1))[0, 0]
        qk = jnp.clip(round_half_up(wk / sk + zk), min_q, max_q)
        q_deq = (qk - zk) * sk
        ek = (wk - q_deq) / d
        mask = (cols > k).astype(w.dtype)
        w = w - ek[:, None] * (rk * mask)[None, :]
        q = jax.lax.dynamic_update_slice_in_dim(q, qk[:, None], k, axis=1)
        e = jax.lax.dynamic_update_slice_in_dim(e, ek[:, None], k, axis=1)
        return w, q, e

    q0 = jnp.zeros_like(w)
    e0 = jnp.zeros_like(w)
    _, q, e = jax.lax.fori_loop(0, b, body, (w, q0, e0))
    return q, e


def _quantize_permuted(w_p, s_p, z_p, r_full, spec: QuantSpec, block_size: int,
                       block_fn):
    """Blockwise pass over the permuted weight; returns codes (m, n).

    Structured as one ``lax.scan`` over column blocks (single compiled
    block body — compile time and HBM temp pressure stay flat in n/B):
    the carry is the still-unquantized weight; each step runs the
    sequential in-block kernel, then one full-width masked MXU GEMM
    propagates the block's scaled error to all later columns.
    """
    m, n = w_p.shape
    B = block_size
    pad = (-n) % B
    if pad:
        w_p = jnp.pad(w_p, ((0, 0), (0, pad)))
        s_p = jnp.pad(s_p, ((0, 0), (0, pad)), constant_values=1.0)
        z_p = jnp.pad(z_p, ((0, 0), (0, pad)))
        r_full = jnp.pad(r_full, ((0, pad), (0, pad)))
        r_full = r_full.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
    npad = n + pad
    nb = npad // B
    col_ids = jnp.arange(npad)

    def step(w_cur, i):
        i1 = i * B
        w1 = jax.lax.dynamic_slice(w_cur, (0, i1), (m, B))
        s1 = jax.lax.dynamic_slice(s_p, (0, i1), (m, B))
        z1 = jax.lax.dynamic_slice(z_p, (0, i1), (m, B))
        r_rows = jax.lax.dynamic_slice(r_full, (i1, 0), (B, npad))
        r1 = jax.lax.dynamic_slice(r_rows, (0, i1), (B, B))
        q1, e1 = block_fn(w1, s1, z1, r1, spec.min_q, spec.max_q)
        # propagate to strictly-later columns (full-width masked GEMM)
        from tgq.utils.precision import best_f32_dot_precision

        cross = jnp.where((col_ids >= i1 + B)[None, :], r_rows, 0.0)
        delta = jax.lax.dot_general(
            e1, cross, (((1,), (0,)), ((), ())),
            precision=best_f32_dot_precision(),
            preferred_element_type=jnp.float32,
        )
        return w_cur - delta, q1

    _, codes_blocks = jax.lax.scan(step, w_p, jnp.arange(nb))
    codes = codes_blocks.transpose(1, 0, 2).reshape(m, npad)
    return codes[:, :n]


@partial(jax.jit, static_argnames=("spec", "block_size", "backend"))
def _quantize_weight_jit(w, r_full, perm, spec: QuantSpec,
                         block_size: int, backend: str):
    m, n = w.shape
    w = w.astype(jnp.float32)
    params = find_params(w, spec)  # pre-permutation => static groups
    s_full, z_full = expand_params(params, n)

    w_p = w[:, perm]
    s_p = s_full[:, perm]
    z_p = z_full[:, perm]

    if backend == "pallas":
        from tgq.kernels.gptq_block import process_block_pallas

        block_fn = process_block_pallas
    else:
        block_fn = _process_block_jnp

    codes_p = _quantize_permuted(w_p, s_p, z_p, r_full, spec, block_size, block_fn)
    wq_p = (codes_p - z_p) * s_p

    inv_perm = jnp.argsort(perm)
    codes = codes_p[:, inv_perm].astype(jnp.int32)
    w_q = wq_p[:, inv_perm]
    return QuantizeResult(codes=codes, w_q=w_q, scale=params.scale,
                          zero=params.zero,
                          rel_error=jnp.array(jnp.nan, jnp.float32))


@jax.jit
def _rel_error_jit(w, w_q, perm, r_x):
    """‖(W−Wq)R_xᵀ‖/‖W R_xᵀ‖ in permuted order (reference :275-291).
    Separate jit so the r_x buffer is only live when diagnostics are on."""
    w_p = w.astype(jnp.float32)[:, perm]
    wq_p = w_q[:, perm]
    num = jnp.linalg.norm((w_p - wq_p) @ r_x.T)
    den = jnp.linalg.norm(w_p @ r_x.T)
    return num / den


def quantize_weight(
    w: jax.Array,
    factor: FactorResult,
    spec: QuantSpec,
    block_size: int = 256,
    backend: str = "jnp",
    with_error: bool = True,
) -> QuantizeResult:
    """Quantize an (out, in) weight with GPTQ error propagation.

    ``factor`` comes from tgq.solver.factorize (any of the three solvers).
    ``backend``: "jnp" (fori_loop oracle) or "pallas" (TPU kernel).
    """
    r_full = jnp.asarray(factor.r_full, jnp.float32)
    perm = jnp.asarray(factor.perm, jnp.int32)
    res = _quantize_weight_jit(w, r_full, perm, spec, block_size, backend)
    if with_error and factor.r_x is not None:
        rel = _rel_error_jit(w, res.w_q, perm,
                             jnp.asarray(factor.r_x, jnp.float32))
        res = dataclasses.replace(res, rel_error=rel)
    return res
