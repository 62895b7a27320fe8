"""Uniform affine quantization math (pure jnp, jittable).

Semantics match the reference quantizer (gptq_utils.py:230-272 of
davidtweedle/gptq-svd) so that perplexity parity is exact:

- symmetric:  max_q = 2^(b-1)-1, min_q = -max_q,
              scale = clamp(amax|w|, 1e-5) / max_q, zero = 0
- asymmetric: max_q = 2^b-1, min_q = 0,
              scale = clamp(max-min, 1e-5) / max_q,
              zero  = clip(round(-min/scale), 0, max_q)
- groups of ``group_size`` along the input dimension (-1 = one group per
  output row, i.e. per-channel).  Group params are computed on the
  *unpermuted* weight and permuted alongside it ("static groups" — no
  g_idx at inference time, reference README.md:43,129).

Everything is functional: a :class:`QuantSpec` carries the static config,
:func:`find_params` returns a :class:`QuantParams` pytree, and the
quantize/dequantize ops are shape-polymorphic jnp functions that jit and
shard cleanly.  Rounding is floor(x + 0.5) — round-half-up — matching the
reference's GPU kernel (gptq_utils.py:354), used for every quantized value.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

SCALE_FLOOR = 1e-5  # reference gptq_utils.py:259,265


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static quantization configuration (hashable; safe as a jit static arg)."""

    bits: int = 4
    group_size: int = 128  # -1 => one group spanning the whole input dim
    sym: bool = False

    @property
    def max_q(self) -> int:
        return 2 ** (self.bits - 1) - 1 if self.sym else 2**self.bits - 1

    @property
    def min_q(self) -> int:
        return -(2 ** (self.bits - 1) - 1) if self.sym else 0

    def groups_for(self, in_features: int) -> int:
        g = self.group_size if self.group_size > 0 else in_features
        if in_features % g != 0:
            raise ValueError(f"in_features={in_features} not divisible by group_size={g}")
        return in_features // g


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantParams:
    """Per-group scale/zero, shape (out_features, n_groups)."""

    scale: jax.Array
    zero: jax.Array


def round_half_up(x: jax.Array) -> jax.Array:
    return jnp.floor(x + 0.5)


@partial(jax.jit, static_argnames="spec")
def find_params(w: jax.Array, spec: QuantSpec) -> QuantParams:
    """Compute per-group scale/zero from a (out, in) weight matrix."""
    m, n = w.shape
    spec.groups_for(n)  # validate divisibility with a clear error
    g = spec.group_size if spec.group_size > 0 else n
    wg = w.reshape(m, n // g, g)
    if spec.sym:
        amax = jnp.clip(jnp.max(jnp.abs(wg), axis=2), min=SCALE_FLOOR)
        scale = amax / spec.max_q
        zero = jnp.zeros_like(scale)
    else:
        mn = jnp.min(wg, axis=2)
        mx = jnp.max(wg, axis=2)
        scale = jnp.clip(mx - mn, min=SCALE_FLOOR) / spec.max_q
        zero = jnp.clip(round_half_up(-mn / scale), 0, spec.max_q)
    return QuantParams(scale=scale, zero=zero)


def expand_params(params: QuantParams, in_features: int) -> tuple[jax.Array, jax.Array]:
    """Repeat per-group params to full (out, in) width (reference :268-272)."""
    n_groups = params.scale.shape[1]
    reps = in_features // n_groups
    return (
        jnp.repeat(params.scale, reps, axis=1),
        jnp.repeat(params.zero, reps, axis=1),
    )


@partial(jax.jit, static_argnames="spec")
def quantize(w: jax.Array, scale: jax.Array, zero: jax.Array, spec: QuantSpec) -> jax.Array:
    """w -> integer codes, with full-width (broadcastable) scale/zero."""
    q = round_half_up(w / scale + zero)
    return jnp.clip(q, spec.min_q, spec.max_q)


def dequantize(q: jax.Array, scale: jax.Array, zero: jax.Array) -> jax.Array:
    return (q.astype(scale.dtype) - zero) * scale


@partial(jax.jit, static_argnames="spec")
def fake_quantize(w: jax.Array, spec: QuantSpec, params: Optional[QuantParams] = None) -> jax.Array:
    """Round-to-nearest quantize-dequantize (the RTN baseline path)."""
    if params is None:
        params = find_params(w, spec)
    scale, zero = expand_params(params, w.shape[1])
    return dequantize(quantize(w, scale, zero, spec), scale, zero)
