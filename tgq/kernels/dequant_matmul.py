"""Fused dequant + matmul Pallas kernel — the serving engine's hot op.

``y = x @ Wᵀ`` with W stored packed-INT in HBM (tgq.core.packing layout:
codes packed *within* each quantization group, so any group-aligned
column window is self-contained).  Weights cross the HBM→VMEM boundary
packed — at INT4 that is 4× less weight traffic than bf16, which is the
whole win for bandwidth-bound decode — and are unpacked + dequantized in
VMEM right at the MXU edge (shifts/masks on the VPU), then fed to a
single f32-accumulating MXU dot per tile.

Grid: (out-tiles, token-tiles, k-tiles) with accumulation over k-tiles
into the output block (zeroed at k==0).  Static groups, no g_idx —
matching the reference's deployment claim (README.md:43).

The XLA fallback (`impl="xla"`) dequantizes the whole W then matmuls —
the correctness oracle and the CPU path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tgq.core.packing import PackedLinear, unpack_rows


def _unpack_tile(codes_ref, bits: int, group_size: int, k_tile: int):
    """Unpack a (TO, k_tile·bits/8) uint8 tile → (TO, k_tile) f32 codes."""
    pg = codes_ref[:]
    to = pg.shape[0]
    g = group_size
    ng = k_tile // g
    gb = g * bits // 8
    pg = pg.reshape(to, ng, gb)
    if bits == 8:
        out = pg.astype(jnp.int32)
    elif bits == 4:
        w = pg.astype(jnp.int32)
        out = jnp.concatenate([w & 0xF, (w >> 4) & 0xF], axis=-1)
    elif bits == 2:
        w = pg.astype(jnp.int32)
        out = jnp.concatenate([(w >> s) & 0x3 for s in (0, 2, 4, 6)], axis=-1)
    elif bits == 3:
        w = pg.reshape(to, ng, 3, g // 8).astype(jnp.int32)
        chunks = []
        for e in range(8):
            val = ((w[:, :, 0, :] >> e) & 1) | ((((w[:, :, 1, :] >> e) & 1)) << 1) \
                  | ((((w[:, :, 2, :] >> e) & 1)) << 2)
            chunks.append(val)
        out = jnp.concatenate(chunks, axis=-1)
    else:
        raise ValueError(bits)
    return out.reshape(to, k_tile).astype(jnp.float32)


def _dequant_matmul_kernel(x_ref, codes_ref, scale_ref, zero_ref, o_ref, *,
                           bits: int, group_size: int, k_tile: int):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    q = _unpack_tile(codes_ref, bits, group_size, k_tile)      # (TO, KT)
    to = q.shape[0]
    ng = k_tile // group_size
    # scale/zero arrive transposed (ng, TO) — Mosaic tile constraints —
    # and are re-oriented here (tiny relayout)
    scale = scale_ref[:].T.reshape(to, ng, 1)
    zero = zero_ref[:].T.reshape(to, ng, 1)
    w = ((q.reshape(to, ng, group_size) - zero) * scale).reshape(to, k_tile)
    x = x_ref[:].astype(jnp.float32)                            # (TT, KT)
    o_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )


def quantized_matmul(
    x: jax.Array,
    w: PackedLinear,
    impl: str = "auto",
    token_tile: int = 256,
    out_tile: int = 512,
    k_tile: int = 2048,
    out_dtype=None,
) -> jax.Array:
    """x: (..., in_features) → (..., out_features)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    n, m = w.in_features, w.out_features
    x2 = x.reshape(-1, n)
    t = x2.shape[0]

    if impl == "xla" or w.group_size <= 0 or n % w.group_size:
        y = x2.astype(jnp.float32) @ w.dequantize(jnp.float32).T
        return y.astype(out_dtype).reshape(*lead, m)

    g = w.group_size
    # Mosaic tile legality when k-tiling (multiple k blocks): the packed
    # byte tile's lane dim must be 128-divisible and the (ng, TO) scale
    # tile's sublane dim 8-divisible → k_tile must be a multiple of
    # lcm(bytes_unit(bits), 8·group).  A single k block (k_tile == n) is
    # always legal (blocks equal to full array dims).
    bytes_unit = {8: 128, 4: 256, 3: 1024, 2: 512}[w.bits]
    import math

    unit = math.lcm(bytes_unit, 8 * g)
    k_tile = min(k_tile, n)
    k_tile = (k_tile // unit) * unit
    if k_tile <= 0 or n % k_tile != 0:
        k_tile = unit if (unit < n and n % unit == 0) else n
    tt = min(token_tile, max(8, -(-t // 8) * 8))
    to = min(out_tile, m)
    bytes_per_k = w.bits * k_tile // 8
    grid = (-(-m // to), -(-t // tt), n // k_tile)

    t_pad = -(-t // tt) * tt
    if t_pad != t:
        x2 = jnp.pad(x2, ((0, t_pad - t), (0, 0)))
    assert m % to == 0 and n % k_tile == 0, (m, to, n, k_tile)

    ng_tile = k_tile // g
    kernel = functools.partial(
        _dequant_matmul_kernel, bits=w.bits, group_size=g, k_tile=k_tile
    )
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, k_tile), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((to, bytes_per_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_tile, to), lambda i, j, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_tile, to), lambda i, j, k: (k, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tt, to), lambda i, j, k: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2, w.codes, w.scale.T, w.zero.T)
    return y[:t].astype(out_dtype).reshape(*lead, m)
