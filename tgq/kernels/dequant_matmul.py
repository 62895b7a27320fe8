"""Fused dequant + matmul Pallas kernel — the serving engine's hot op.

``y = x @ Wᵀ`` with W stored packed-INT in HBM in **K-major** layout
(tgq.core.packing.PackedLinear: codes (packed_in, out), scale/zero
(groups, out)).  Weights cross the HBM→VMEM boundary packed — at INT4
that is 4× less weight traffic than bf16, which is the whole win for
bandwidth-bound decode — and are unpacked + dequantized in VMEM right at
the MXU edge, then fed to a single f32-accumulating (TT,KT)×(KT,TO) MXU
dot per tile.

Layout discipline (Mosaic): with the contraction dim on sublanes, every
unpack step is a *leading-dim* split/merge — (BK, TO) → (ng, gb, TO) →
nibble/plane chunks concatenated on axis 1 → (KT, TO) — which Mosaic
lowers without lane shuffles; the lane dim (out) is never reshaped.
Grid: (out-tiles, token-tiles, k-tiles) with accumulation over k-tiles.
Static groups, no g_idx (reference README.md:43).

The XLA fallback (`impl="xla"`) dequantizes then matmuls — correctness
oracle and CPU path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tgq.core.packing import PackedLinear


def _unpack_codes(pg: jax.Array, bits: int, group_size: int):
    """(BK, TO) packed bytes → (ng, g, TO) int32 codes; leading-dim ops
    only."""
    bk, to = pg.shape
    g = group_size
    gb = g * bits // 8
    ng = bk // gb
    w = pg.reshape(ng, gb, to).astype(jnp.int32)
    if bits == 8:
        q = w
    elif bits == 4:
        q = jnp.concatenate([w & 0xF, (w >> 4) & 0xF], axis=1)
    elif bits == 2:
        q = jnp.concatenate([(w >> s) & 0x3 for s in (0, 2, 4, 6)], axis=1)
    elif bits == 3:
        # planes21 layout (core.packing): per group, 2-bit plane (g/4
        # bytes, split-quarter) then 1-bit plane (g/8 bytes,
        # split-eighth).  12 lane-aligned leading-dim chunks — ~3×
        # less VPU work than the old triple-byte layout's 8 chunks ×
        # 3 reads + 5 bit-ops (which measured a 24 % decode
        # throughput loss).  NOTE: a 4-D broadcasted-shift form (no
        # concats) fails Mosaic lowering (`tpu.reshape` on the 4-D
        # shift vector) — keep the chunk-concat form.
        w2 = w[:, : g // 4]            # (ng, g/4, to)
        w1 = w[:, g // 4:] << 2        # (ng, g/8, to); chunks: (>>e)&4
        lo = jnp.concatenate([(w2 >> (2 * i)) & 0x3 for i in range(4)],
                             axis=1)
        hi = jnp.concatenate([(w1 >> e) & 0x4 for e in range(8)], axis=1)
        q = lo | hi
    else:
        raise ValueError(bits)
    return q


def _unpack_tile_kmajor(pg: jax.Array, bits: int, group_size: int):
    """(BK, TO) packed bytes → (ng, g, TO) f32 codes."""
    return _unpack_codes(pg, bits, group_size).astype(jnp.float32)


def _dequant_matmul_kernel(x_ref, up_ref, codes_ref, scale_ref, zero_ref,
                           o_ref, acc_ref, *, bits: int, group_size: int,
                           k_tile: int, n_k: int):
    """Accumulates k-tiles in a VMEM f32 scratch and writes ``o_ref``
    (any dtype) once on the last k step — emitting bf16 directly halves
    the output HBM traffic and removes the separate cast op the f32
    out_shape used to require.

    ``up_ref`` (GLU mode, down_proj): x_ref holds the gate tile and
    up_ref the up tile of the same fused gate_up activation buffer (two
    BlockSpecs over one operand — no copies); the kernel computes
    silu(gate)·up on the fly, so the silu intermediate never exists in
    HBM."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = _unpack_tile_kmajor(codes_ref[:], bits, group_size)  # (ng, g, TO)
    ng, g, to = q.shape
    s = scale_ref[:].reshape(ng, 1, to)
    z = zero_ref[:].reshape(ng, 1, to)
    w = ((q - z) * s).reshape(k_tile, to)
    x = x_ref[:].astype(jnp.float32)                          # (TT, KT)
    if up_ref is not None:
        u = up_ref[:].astype(jnp.float32)
        x = x * jax.lax.logistic(x) * u                       # silu(g)·u
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _a8_matmul_kernel(x_ref, a_ref, codes_ref, scale_ref, zero_ref,
                      o_ref, acc_ref, *, bits: int, group_size: int,
                      k_tile: int, n_k: int):
    """W4A8 tile: int8 activations × int8 zero-shifted weight codes on
    the MXU (2× the bf16 rate on v5e — measured 286 TOPS vs 138 TF/s),
    per-group f32 scale-accumulate, per-token activation scales applied
    once at the end.

    The asym zero-point is INTEGER-valued by construction
    (core.quant.find_params: round(-min/scale) clipped to [0, max_q];
    sym codes store biased by +max_q with zero = max_q), so
    ``q - z`` fits int8 for bits ≤ 4 and the dot is EXACT in int32 —
    no zero-point correction term, no precision compromise beyond the
    activation quantization itself.  y = a_t · Σ_g s_{g,o} ·
    (x8_g · (q - z)_g).
    """
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = _unpack_codes(codes_ref[:], bits, group_size)   # (ng, g, TO) i32
    ng, g, to = q.shape
    z = zero_ref[:].astype(jnp.int32).reshape(ng, 1, to)
    qz = (q - z).astype(jnp.int8)                       # |q-z| <= 15
    s = scale_ref[:]                                    # (ng, TO) f32
    x8 = x_ref[:]                                       # (TT, KT) i8
    acc = acc_ref[:]
    for gi in range(ng):
        d = jax.lax.dot_general(
            x8[:, gi * g:(gi + 1) * g], qz[gi],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + d.astype(jnp.float32) * s[gi:gi + 1]
    acc_ref[:] = acc

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * a_ref[:]).astype(o_ref.dtype)


def quantize_activations(x: jax.Array):
    """(T, K) f32/bf16 → (int8 codes, (T, 1) f32 per-token scales) —
    symmetric per-token absmax, the standard W8A8 activation recipe."""
    xf = x.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-10)
    return jnp.round(xf / a).astype(jnp.int8), a


def quantized_matmul(
    x: jax.Array,
    w: PackedLinear,
    impl: str = "auto",
    token_tile: int = 256,
    out_tile: int = 512,
    k_tile: int = 2048,
    out_dtype=None,
    layer: jax.Array | None = None,
    glu: bool = False,
) -> jax.Array:
    """x: (..., in_features) → (..., out_features).

    ``glu``: x's last dim is 2·in_features holding [gate | up]; the
    matmul input is silu(gate)·up, computed inside the kernel from two
    BlockSpec views of the same buffer (the silu intermediate never
    round-trips HBM on the pallas path).

    ``layer``: when given, ``w``'s arrays carry a leading layer dim
    (layer-stacked params from a serving scan) and ``layer`` is a traced
    scalar index.  The kernel's BlockSpec index maps read it via scalar
    prefetch, so weight tiles stream straight out of the stacked arrays —
    the calling scan never slices a layer's weights (XLA would
    materialize a full per-layer copy of the packed weights every
    decode step).
    """
    a8_capable = w.act_bits == 8 and w.bits in (2, 3, 4)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        # Large-batch (prefill) routing: the kernel's grid re-streams
        # every weight tile once per 256-token tile (weight blocks
        # depend on (k, out) only, but k advances fastest), so at t
        # token tiles the packed weights cross HBM t/256 times.  Past
        # ~4 tiles the dequantize-once XLA path reads the weights a
        # single time and runs the matmul at full MXU rate — decode
        # (t <= a few hundred) stays on the fused kernel where packed
        # reads are the whole win.  A8 stays on the kernel at every
        # batch size: the int8 MXU runs 2× bf16, so even with per-tile
        # weight re-streaming (512-token tiles) the packed reads hide
        # under the halved compute.
        t_route = 1
        for d in x.shape[:-1]:
            t_route *= d
        if t_route >= 1024 and not a8_capable:
            impl = "xla"
    a8 = a8_capable and impl == "pallas"
    stacked = layer is not None
    if stacked and impl != "pallas":
        w = jax.tree.map(lambda a: a[layer], w)
        stacked = False
        layer = None
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    n, m = w.in_features, w.out_features
    x2 = x.reshape(-1, 2 * n if glu else n)
    t = x2.shape[0]

    def bias_of(w):
        b = w.bias
        if b is not None and stacked:
            b = b[layer]
        return b

    def finish(y, w):
        b = bias_of(w)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y.astype(out_dtype).reshape(*lead, m)

    def glu_fold(x2):
        g, u = x2[:, :n], x2[:, n:]
        gf = g.astype(jnp.float32)
        return gf * jax.lax.logistic(gf) * u.astype(jnp.float32)

    if impl == "xla" or w.group_size <= 0 or n % w.group_size:
        if stacked:
            w = jax.tree.map(lambda a: a[layer], w)
            stacked = False
        xin = glu_fold(x2) if glu else x2.astype(jnp.float32)
        if a8_capable:
            # simulate the A8 kernel's semantics (fake-quantized
            # activations) so act_bits means the same thing on every
            # backend — and so hermetic CPU tests measure A8 quality
            x8, a = quantize_activations(xin)
            xin = x8.astype(jnp.float32) * a
        y = xin @ w.dequantize(jnp.float32).T
        return finish(y, w)

    ascale = None
    if a8:
        # fold GLU in XLA (silu never round-trips packed) and quantize
        # the activations per token BEFORE tiling; the kernel consumes
        # int8 codes + (t, 1) scales
        xin = glu_fold(x2) if glu else x2
        x2, ascale = quantize_activations(xin)
        glu = False

    g = w.group_size
    # k-tile legality (Mosaic min tiles): the u8 codes tile's sublane dim
    # (k·bits/8) must be a multiple of 32, the f32 scale tile's sublane
    # (k/g) a multiple of 8, and x's lane dim (k) a multiple of 128 — or
    # the k dim must be a single full tile.
    bytes_unit = {8: 32, 4: 64, 3: 256, 2: 128}[w.bits]
    unit = math.lcm(bytes_unit, 8 * g, 128)
    k_tile = min(k_tile, n)
    k_tile = (k_tile // unit) * unit
    if k_tile <= 0 or n % k_tile != 0:
        k_tile = unit if (unit < n and n % unit == 0) else n
    # A8 prefill: bigger token tiles halve the per-tile weight
    # re-streaming, and the int8 VMEM x tile stays small
    tt = min(512 if (a8 and t >= 1024) else token_tile,
             max(8, -(-t // 8) * 8))
    to = min(out_tile, m)
    while m % to and to > 128:
        to //= 2
    if m % to:  # out dim not tileable (must be a lane multiple)
        if stacked:
            w = jax.tree.map(lambda a: a[layer], w)
            stacked = False
        if ascale is not None:  # a8 codes → dequantized activations
            xin = x2.astype(jnp.float32) * ascale
        else:
            xin = glu_fold(x2) if glu else x2.astype(jnp.float32)
        y = xin @ w.dequantize(jnp.float32).T
        return finish(y, w)
    bytes_per_k = w.bits * k_tile // 8
    grid = (-(-m // to), -(-t // tt), n // k_tile)

    t_pad = -(-t // tt) * tt
    if t_pad != t:
        x2 = jnp.pad(x2, ((0, t_pad - t), (0, 0)))
        if ascale is not None:
            ascale = jnp.pad(ascale, ((0, t_pad - t), (0, 0)))
    assert m % to == 0 and n % k_tile == 0, (m, to, n, k_tile)
    n_k = n // k_tile  # up tile of GLU inputs = gate block index + n_k

    ng_tile = k_tile // g
    if a8:
        kernel = functools.partial(
            _a8_matmul_kernel, bits=w.bits, group_size=g, k_tile=k_tile,
            n_k=grid[2],
        )
    else:
        kernel = functools.partial(
            _dequant_matmul_kernel, bits=w.bits, group_size=g,
            k_tile=k_tile, n_k=grid[2],
        )
        if not glu:
            kernel = functools.partial(lambda f, x, c, s, z, o, a: f(
                x, None, c, s, z, o, a), kernel)
    # emit the output in the requested dtype straight from the VMEM
    # accumulator (halves output HBM traffic for bf16 consumers); keep
    # f32 when a bias is added afterwards so its addition precision is
    # unchanged
    y_dtype = (jnp.float32 if (bias_of(w) is not None
                               or out_dtype == jnp.float32)
               else jnp.dtype(out_dtype))
    scratch = [pltpu.VMEM((tt, to), jnp.float32)]
    if stacked:
        def skernel(layer_ref, *refs):
            return kernel(*refs)

        gate_spec = pl.BlockSpec((tt, k_tile), lambda i, j, k, L: (j, k))
        in_specs = [gate_spec]
        operands = [x2]
        if glu:
            in_specs.append(pl.BlockSpec(
                (tt, k_tile), lambda i, j, k, L: (j, k + n_k)))
            operands.append(x2)
        elif a8:
            in_specs.append(pl.BlockSpec((tt, 1), lambda i, j, k, L: (j, 0)))
            operands.append(ascale)
        in_specs += [
            pl.BlockSpec((None, bytes_per_k, to),
                         lambda i, j, k, L: (L[0], k, i)),
            pl.BlockSpec((None, ng_tile, to),
                         lambda i, j, k, L: (L[0], k, i)),
            pl.BlockSpec((None, ng_tile, to),
                         lambda i, j, k, L: (L[0], k, i)),
        ]
        y = pl.pallas_call(
            skernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((tt, to), lambda i, j, k, L: (j, i)),
                grid=grid,
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((t_pad, m), y_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=jax.default_backend() != "tpu",
        )(jnp.asarray(layer, jnp.int32).reshape(1),
          *operands, w.codes, w.scale, w.zero)
        return finish(y[:t], w)

    in_specs = [pl.BlockSpec((tt, k_tile), lambda i, j, k: (j, k),
                             memory_space=pltpu.VMEM)]
    operands = [x2]
    if glu:
        in_specs.append(pl.BlockSpec((tt, k_tile),
                                     lambda i, j, k: (j, k + n_k),
                                     memory_space=pltpu.VMEM))
        operands.append(x2)
    elif a8:
        in_specs.append(pl.BlockSpec((tt, 1), lambda i, j, k: (j, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(ascale)
    in_specs += [
        pl.BlockSpec((bytes_per_k, to), lambda i, j, k: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ng_tile, to), lambda i, j, k: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ng_tile, to), lambda i, j, k: (k, i),
                     memory_space=pltpu.VMEM),
    ]
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tt, to), lambda i, j, k: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, m), y_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands, w.codes, w.scale, w.zero)
    return finish(y[:t], w)
