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
    """Blockwise pass over the permuted weight; returns (codes, e_scaled)."""
    m, n = w_p.shape
    codes = jnp.zeros_like(w_p)
    w_cur = w_p
    for i1 in range(0, n, block_size):
        i2 = min(i1 + block_size, n)
        w1 = w_cur[:, i1:i2]
        s1 = s_p[:, i1:i2]
        z1 = z_p[:, i1:i2]
        r1 = r_full[i1:i2, i1:i2]
        q1, e1 = block_fn(w1, s1, z1, r1, spec.min_q, spec.max_q)
        codes = codes.at[:, i1:i2].set(q1)
        if i2 < n:
            cross = r_full[i1:i2, i2:]
            delta = jax.lax.dot_general(
                e1, cross, (((1,), (0,)), ((), ())), precision=_HIGHEST,
                preferred_element_type=jnp.float32,
            )
            w_cur = w_cur.at[:, i2:].add(-delta)
    return codes


@partial(jax.jit, static_argnames=("spec", "block_size", "backend"))
def _quantize_weight_jit(w, r_full, perm, r_x, spec: QuantSpec,
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

    if r_x is not None:
        # relative prediction error in permuted order (reference :275-291)
        num = jnp.linalg.norm((w_p - wq_p) @ r_x.T)
        den = jnp.linalg.norm(w_p @ r_x.T)
        rel = num / den
    else:
        rel = jnp.array(jnp.nan, jnp.float32)
    return QuantizeResult(codes=codes, w_q=w_q, scale=params.scale,
                          zero=params.zero, rel_error=rel)


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
    r_x = jnp.asarray(factor.r_x, jnp.float32) if (
        with_error and factor.r_x is not None) else None
    return _quantize_weight_jit(w, r_full, perm, r_x, spec, block_size, backend)
