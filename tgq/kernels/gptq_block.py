"""Pallas TPU kernel: in-block sequential GPTQ quantize + error propagate.

TPU-native counterpart of the reference's Triton ``gptq_block_kernel``
(gptq_utils.py:298-387), redesigned for the VPU/VMEM model rather than
translated.

**Measured and NOT the production default** (r3, tgq.cli
.gptq_kernel_bench on v5e at real Qwen3-8B module shapes, W4 g128,
block 1024): the jnp fori_loop path (tgq.solver.gptq_loop) is ~3.7×
faster (jnp 11.8 s vs pallas 43.3 s summed over o/qkv/gate_up/down
shapes).  The sweep is a sequential per-column chain of masked VPU ops;
XLA fuses each column step across the full (out_f, b) width, while this
kernel's 128-row grid tiles re-run the column chain per tile — more
total sequential steps, same VPU width.  The reference's conclusion is
the opposite on GPU (its Triton kernel IS its production path,
gptq_utils.py:507-514) because CUDA thread blocks parallelize rows for
free; on TPU the row dimension is already vectorized inside one core.
Kept as the oracle-verified native-kernel counterpart and for
QuantizeConfig(kernel_backend="pallas") experiments:

- grid over row tiles (default 128 rows — 16 f32 sublane tiles); every
  program keeps its (ROWS × B) weight/scale/zero tile and the (B × B)
  propagation block resident in VMEM for the whole column sweep, so the
  sequential dependency never touches HBM.
- the column loop is a ``lax.fori_loop``; column k is selected with a
  lane-mask reduction (TPUs can't cheaply gather a dynamic lane, but a
  masked sum over 128-lane vregs is a native VPU op — the same trick the
  reference uses in Triton for the same reason).
- R's row k is sliced from VMEM with a dynamic sublane slice (``pl.ds``),
  which Mosaic lowers natively.

Outputs integer codes (as f32) and the *scaled* error e = (w - q̂)/R[k,k],
which is exactly what the inter-block MXU GEMM in tgq.solver.gptq_loop
consumes — one convention everywhere, unlike the reference's raw-vs-scaled
split between its Triton and torch paths (gptq_utils.py:537-545).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128 rows x 1024-col blocks: w/s/z/q/e tiles + the (b, b) R block fit
# in ~7 MB of VMEM incl. loop-carry double buffers — 256 rows exceeded
# the 16 MB scoped limit at real 8B block widths (b_pad 1024)
DEFAULT_ROWS = 128


def _gptq_block_kernel(w_ref, s_ref, z_ref, r_ref, q_ref, e_ref, *,
                       min_q: int, max_q: int, n_cols: int):
    w = w_ref[:]
    s = s_ref[:]
    z = z_ref[:]
    rows, b = w.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(k, carry):
        w, q, e = carry
        mask_k = col_ids == k  # (1, b)
        wk = jnp.sum(jnp.where(mask_k, w, 0.0), axis=1)  # (rows,)
        sk = jnp.sum(jnp.where(mask_k, s, 0.0), axis=1)
        zk = jnp.sum(jnp.where(mask_k, z, 0.0), axis=1)
        r_row = r_ref[pl.ds(k, 1), :]  # (1, b) dynamic sublane slice
        d = jnp.sum(jnp.where(mask_k, r_row, 0.0))
        qk = jnp.clip(jnp.floor(wk / sk + zk + 0.5), min_q, max_q)
        q_deq = (qk - zk) * sk
        ek = (wk - q_deq) / d
        prop = jnp.where(col_ids > k, r_row, 0.0)  # (1, b)
        w = w - ek[:, None] * prop
        q = jnp.where(mask_k, qk[:, None], q)
        e = jnp.where(mask_k, ek[:, None], e)
        return w, q, e

    q0 = jnp.zeros_like(w)
    e0 = jnp.zeros_like(w)
    _, q, e = jax.lax.fori_loop(0, n_cols, body, (w, q0, e0))
    q_ref[:] = q
    e_ref[:] = e


def process_block_pallas(
    w: jax.Array,
    s: jax.Array,
    z: jax.Array,
    r: jax.Array,
    min_q: int,
    max_q: int,
    rows_per_tile: int = DEFAULT_ROWS,
    interpret: bool | None = None,
):
    """Drop-in replacement for the jnp in-block oracle.

    w, s, z: (m, b) f32;  r: (b, b) f32 upper-triangular.
    Returns (codes, e_scaled), both (m, b) f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, b = w.shape
    # pad rows to the tile multiple; lane dim b is handled by Mosaic's
    # implicit padding of the trailing tile, but scale must stay non-zero,
    # so pad explicitly when b is not a multiple of 128.
    b_pad = -(-b // 128) * 128
    m_pad = -(-m // rows_per_tile) * rows_per_tile
    if b_pad != b:
        w = jnp.pad(w, ((0, 0), (0, b_pad - b)))
        s = jnp.pad(s, ((0, 0), (0, b_pad - b)), constant_values=1.0)
        z = jnp.pad(z, ((0, 0), (0, b_pad - b)))
        r_pad = jnp.zeros((b_pad, b_pad), r.dtype)
        r_pad = r_pad.at[:b, :b].set(r)
        r_pad = r_pad.at[jnp.arange(b, b_pad), jnp.arange(b, b_pad)].set(1.0)
        r = r_pad
    if m_pad != m:
        w = jnp.pad(w, ((0, m_pad - m), (0, 0)))
        s = jnp.pad(s, ((0, m_pad - m), (0, 0)), constant_values=1.0)
        z = jnp.pad(z, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // rows_per_tile,)
    kernel = functools.partial(
        _gptq_block_kernel, min_q=min_q, max_q=max_q, n_cols=b
    )
    tile = lambda i: (i, 0)  # noqa: E731
    full = lambda i: (0, 0)  # noqa: E731
    q, e = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_per_tile, b_pad), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_tile, b_pad), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_tile, b_pad), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, b_pad), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows_per_tile, b_pad), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_tile, b_pad), tile, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
        ],
        interpret=interpret,
    )(w, s, z, r)
    return q[:m, :b], e[:m, :b]
