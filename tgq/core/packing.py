"""Packed sub-byte integer weight storage (INT8/4/3/2).

The reference leaves packed export as a roadmap item (README.md:133) and
saves dequantized fp16; here packed formats are first-class so the serving
engine can keep weights INT in HBM and dequantize in VMEM at the MXU edge.

Layouts are chosen for TPU unpacking cost, not byte-compatibility with any
GPU format.  All packing runs along the input-feature (contraction) axis of
an (out, in) weight:

- **int8**: raw int8 codes.
- **int4**: two codes per int8 in *split-half* layout — byte ``j`` holds
  code ``j`` (low nibble) and code ``j + n/2`` (high nibble).  Unpacking
  yields two *contiguous* half-blocks (two shifts + masks), no lane
  interleave — a cheap VPU op inside a matmul kernel.
- **int2**: four codes per int8 in split-quarter layout (same idea).
- **int3** (layout v2, "planes21"): a **2-bit plane** (the codes' low
  two bits, split-quarter packed — g/4 bytes) followed by a **1-bit
  plane** (the high bit, split-eighth packed — g/8 bytes) per group.
  Exactly 3 bits/code with no waste, and the unpack is
  ``lo2 | (hi1 << 2)`` — 4 + 8 lane-aligned shift/mask chunks, ~3×
  less VPU work than the original three-plane triple-byte layout,
  whose byte-boundary-crossing unpack cost W3 serving 24 % decode
  throughput (r4 RESULTS.md low-bit table; redesigned per r4 VERDICT
  directive #3).

Symmetric codes (range ``[-max_q, max_q]``) are stored biased by
``+max_q`` so every stored code is unsigned; the bias is folded into the
zero-point, so dequantization is always ``(code - zero') * scale``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tgq.core.quant import QuantSpec


def _split_pack(codes: jax.Array, per_byte: int, bits: int) -> jax.Array:
    """Pack ``per_byte`` equal contiguous chunks of the last axis into int8."""
    *lead, n = codes.shape
    assert n % per_byte == 0, (n, per_byte)
    chunk = n // per_byte
    c = codes.astype(jnp.int32).reshape(*lead, per_byte, chunk)
    shifts = (jnp.arange(per_byte, dtype=jnp.int32) * bits).reshape(
        *(1 for _ in lead), per_byte, 1
    )
    word = jnp.sum(c << shifts, axis=-2)
    return word.astype(jnp.uint8)


def _split_unpack(packed: jax.Array, per_byte: int, bits: int) -> jax.Array:
    *lead, chunk = packed.shape
    w = packed.astype(jnp.int32)
    mask = (1 << bits) - 1
    chunks = [(w >> (i * bits)) & mask for i in range(per_byte)]
    return jnp.concatenate(chunks, axis=-1)


def _planes21_pack(codes: jax.Array) -> jax.Array:
    """3-bit "planes21" layout: the low 2 bits split-quarter packed
    (n/4 bytes) followed by the high bit split-eighth packed (n/8
    bytes) — 3n/8 bytes total, both planes lane-aligned."""
    c = codes.astype(jnp.int32)
    lo = _split_pack(c & 0x3, 4, 2)            # (..., n/4)
    hi = _split_pack((c >> 2) & 0x1, 8, 1)     # (..., n/8)
    return jnp.concatenate([lo, hi], axis=-1)  # (..., 3n/8)


def _planes21_unpack(packed: jax.Array, n: int) -> jax.Array:
    """Inverse: (..., 3n/8) → (..., n) int32 codes = ``lo2 | hi1<<2``."""
    lo = _split_unpack(packed[..., : n // 4], 4, 2)
    hi = _split_unpack(packed[..., n // 4:], 8, 1)
    return lo | (hi << 2)


def pack_rows(codes: jax.Array, bits: int, group_size: int | None = None) -> jax.Array:
    """Pack non-negative integer codes along the last axis.

    With ``group_size`` set (the quantization group), packing is applied
    *within each group* (split-half/quarter or bit-planes per group), so
    group-aligned column windows of the packed array are self-contained.
    """
    *lead, n = codes.shape
    g = group_size if (group_size and 0 < group_size < n and n % group_size == 0) else n
    cg = codes.reshape(*lead, n // g, g)
    if bits == 8:
        out = cg.astype(jnp.uint8)
    elif bits == 4:
        out = _split_pack(cg, 2, 4)
    elif bits == 2:
        out = _split_pack(cg, 4, 2)
    elif bits == 3:
        out = _planes21_pack(cg)  # (..., n//g, 3g/8)
    else:
        raise ValueError(f"unsupported bit width {bits}")
    return out.reshape(*lead, -1)


def unpack_rows(packed: jax.Array, bits: int, group_size: int | None = None,
                in_features: int | None = None) -> jax.Array:
    """Inverse of :func:`pack_rows`; returns int32 codes."""
    *lead, nbytes = packed.shape
    n = in_features if in_features is not None else nbytes * 8 // bits
    g = group_size if (group_size and 0 < group_size < n and n % group_size == 0) else n
    gb = g * bits // 8  # packed bytes per group
    pg = packed.reshape(*lead, n // g, gb)
    if bits == 8:
        out = pg.astype(jnp.int32)
    elif bits == 4:
        out = _split_unpack(pg, 2, 4)
    elif bits == 2:
        out = _split_unpack(pg, 4, 2)
    elif bits == 3:
        out = _planes21_unpack(pg, g)
    else:
        raise ValueError(f"unsupported bit width {bits}")
    return out.reshape(*lead, n)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedLinear:
    """A quantized linear layer's on-HBM representation, **K-major**:

    - ``codes``: (packed_in_bytes, out) uint8 — packed along in_features
      (group-local layout from pack_rows), then stored transposed so the
      contraction dim is the sublane dim.  The fused dequant-matmul
      kernel then only ever splits/merges leading dims (Mosaic-legal)
      and feeds the MXU a (KT, TO) operand with no transposes.
    - ``scale``/``zero``: (n_groups, out) f32.
    - codes are unsigned (symmetric codes biased by +max_q, bias folded
      into ``zero``).
    """

    codes: jax.Array
    scale: jax.Array
    zero: jax.Array
    bits: int = dataclasses.field(metadata={"static": True})
    group_size: int = dataclasses.field(metadata={"static": True})
    in_features: int = dataclasses.field(metadata={"static": True})
    out_features: int = dataclasses.field(metadata={"static": True})
    # optional additive bias (out,) — kept dense (Qwen2-family q/k/v
    # carry biases; quantizing them would gain nothing)
    bias: jax.Array | None = None
    # TP role under a serving mesh ("col" = out-sharded q/k/v/gate/up,
    # "row" = in-sharded o/down with a psum) — set by
    # tgq.parallel.mesh.mark_tp_kinds; routes apply_linear through the
    # shard_map'd kernel so each shard runs the fused dequant-matmul
    # locally (a pallas_call inside pjit cannot be auto-partitioned)
    tp_kind: str | None = dataclasses.field(
        default=None, metadata={"static": True})
    # activation precision for the fused matmul: 16 = bf16 MXU (default),
    # 8 = W4A8 — per-token-absmax int8 activations × zero-shifted int8
    # weight codes on the int8 MXU (2× the bf16 rate on v5e).  Set by the
    # serving engine (ServeConfig.a_bits) via tgq.serve.engine; only
    # meaningful for bits <= 4 (q - z must fit int8).
    act_bits: int = dataclasses.field(default=16, metadata={"static": True})

    @classmethod
    def from_codes(
        cls, q: jax.Array, scale: jax.Array, zero: jax.Array, spec: QuantSpec,
        bias: jax.Array | None = None,
    ) -> "PackedLinear":
        """From signed/unsigned integer codes (out, in) + per-group params."""
        m, n = q.shape
        code_bias = spec.max_q if spec.sym else 0
        stored = (q + code_bias).astype(jnp.int32)
        g = spec.group_size if spec.group_size > 0 else n
        return cls(
            codes=pack_rows(stored, spec.bits, group_size=g).T,
            scale=scale.astype(jnp.float32).T,
            zero=(zero + code_bias).astype(jnp.float32).T,
            bits=spec.bits,
            group_size=g,
            in_features=n,
            out_features=m,
            bias=None if bias is None else bias.astype(jnp.float32),
        )

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Full dequantization to (out, in) — reference path for tests/eval."""
        q = unpack_rows(self.codes.T, self.bits, group_size=self.group_size,
                        in_features=self.in_features).astype(jnp.float32)
        reps = self.in_features // self.scale.shape[0]
        scale = jnp.repeat(self.scale.T, reps, axis=1)
        zero = jnp.repeat(self.zero.T, reps, axis=1)
        return ((q - zero) * scale).astype(dtype)

    @property
    def nbytes(self) -> int:
        return sum(x.size * x.dtype.itemsize for x in (self.codes, self.scale, self.zero))


def concat_out(parts: list[PackedLinear]) -> PackedLinear:
    """Fuse projections that share an input into one PackedLinear by
    concatenating along out_features (the lane axis of every array).

    Quantization groups run along in_features, so this is numerically
    exact — each output column keeps its own scale/zero.  Used by the
    serving engine to fuse q/k/v and gate/up into single dequant-matmul
    dispatches."""
    p0 = parts[0]
    for p in parts[1:]:
        assert (p.bits, p.group_size, p.in_features, p.act_bits) == (
            p0.bits, p0.group_size, p0.in_features, p0.act_bits), (p, p0)
    if any(p.bias is not None for p in parts):
        bias = jnp.concatenate([
            p.bias if p.bias is not None
            else jnp.zeros((p.out_features,), jnp.float32)
            for p in parts], axis=-1)
    else:
        bias = None
    return PackedLinear(
        codes=jnp.concatenate([p.codes for p in parts], axis=-1),
        scale=jnp.concatenate([p.scale for p in parts], axis=-1),
        zero=jnp.concatenate([p.zero for p in parts], axis=-1),
        bits=p0.bits,
        group_size=p0.group_size,
        in_features=p0.in_features,
        out_features=sum(p.out_features for p in parts),
        bias=bias,
        act_bits=p0.act_bits,
    )


def pad_out(p: PackedLinear, multiple: int = 512) -> PackedLinear:
    """Zero-pad a PackedLinear's out_features (the lane axis) up to a
    multiple.

    A vocab head like Qwen3's 151936 is not a multiple of 512, which
    forces the fused dequant-matmul's out-tile down to 128 — a 4×
    narrower MXU output tile per pass.  Padding at PACK time (never per
    call — the codes are hundreds of MB) restores the wide tile; the
    pad columns dequantize to ~0 (zero codes, zero zero-point, floor
    scale) and callers slice the logits back to the true vocab
    (tgq.models.causal_lm.lm_logits)."""
    m = p.out_features
    m_pad = -(-m // multiple) * multiple
    if m_pad == m:
        return p
    pc = m_pad - m
    return PackedLinear(
        codes=jnp.pad(p.codes, ((0, 0), (0, pc))),
        scale=jnp.pad(p.scale, ((0, 0), (0, pc))),
        zero=jnp.pad(p.zero, ((0, 0), (0, pc))),
        bits=p.bits,
        group_size=p.group_size,
        in_features=p.in_features,
        out_features=m_pad,
        bias=None if p.bias is None else jnp.pad(p.bias, (0, pc)),
        act_bits=p.act_bits,
    )
