"""Calibration of static per-channel KV equalizers.

Per-token absmax KV quantization (tgq.serve.kv_cache) spends its whole
dynamic range on the largest channel of each token row; K/V channel
magnitudes in trained LLMs are strongly non-uniform (KIVI / KVQuant
observation — PAPERS.md), so most channels quantize coarsely.  A static
per-channel equalizer — rows stored as K/k_eq, V/v_eq — flattens the
profile before the per-token absmax, at zero runtime cost (the
equalizers fold into the query / attention output on the kernel path).

``estimate_kv_equalizers`` measures the per-channel RMS of post-rope K
and of V on a calibration batch, layer by layer (the same quantities the
cache actually stores), normalized to mean 1 per KV head so the
per-token scales keep their usual magnitude.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tgq.models.config import ModelConfig


def _channel_profile(t: jax.Array) -> jax.Array:
    """(batch, seq, kvh, d) → (kvh·d,) per-channel RMS, mean-1 per head."""
    r = jnp.sqrt(jnp.mean(jnp.square(t.astype(jnp.float32)), axis=(0, 1))
                 + 1e-12)                      # (kvh, d)
    r = r / jnp.mean(r, axis=-1, keepdims=True)
    return jnp.maximum(r, 1e-3).reshape(-1)


def estimate_kv_equalizers(params, cfg: ModelConfig, input_ids,
                           attn_impl: str = "auto"):
    """(k_eq, v_eq), each (layers, kv_heads·head_dim) f32 numpy.

    ``params`` must be the plain per-layer-list tree (call before the
    engine's layer stacking).  ``input_ids``: (batch, seq) calibration
    tokens — a few hundred tokens suffice for stable channel profiles.
    """
    from tgq.models.causal_lm import (
        apply_linear,
        apply_rope,
        attn_input,
        decoder_layer,
        embed_tokens,
        rms_norm,
        rope_cache,
    )

    input_ids = jnp.asarray(input_ids)
    x = embed_tokens(params, input_ids)
    cos, sin = rope_cache(cfg, input_ids.shape[1])
    b, s = input_ids.shape

    @jax.jit
    def layer_stats(lp, x):
        h = attn_input(lp, cfg, x)
        k = apply_linear(lp["self_attn"]["k_proj"], h).reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim)
        v = apply_linear(lp["self_attn"]["v_proj"], h).reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            k = rms_norm(k, lp["self_attn"]["k_norm"]["weight"],
                         cfg.rms_norm_eps)
        k = apply_rope(k, cos, sin)  # the cache stores post-rope K
        return _channel_profile(k), _channel_profile(v)

    k_eqs, v_eqs = [], []
    for lp in params["model"]["layers"]:
        ek, ev = layer_stats(lp, x)
        k_eqs.append(np.asarray(ek))
        v_eqs.append(np.asarray(ev))
        x = decoder_layer(lp, cfg, x, cos, sin, attn_impl=attn_impl)
    return np.stack(k_eqs), np.stack(v_eqs)
