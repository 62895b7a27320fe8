"""Jitted prefill / decode steps over the paged KV cache.

Decode processes all slots every step (inactive slots compute garbage
that is masked on the host) — static shapes, one compiled step reused
for the whole serving lifetime.  Attention gathers each slot's pages and
masks by true length; quantized linears route through the fused
dequant-matmul kernel automatically (tgq.models.causal_lm.apply_linear).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tgq.models.causal_lm import (
    apply_linear,
    apply_final_norm,
    embed_tokens,
    lm_logits,
    rms_norm,
    rope_cache,
)
from tgq.models.config import ModelConfig
from tgq.serve.kv_cache import PagedKVCache, gather_slot_kv, write_decode, write_prefill


def _rope_at(cos_tab, sin_tab, pos, x):
    """Apply rotary at per-slot positions.  x: (slots, heads, d); pos: (slots,)."""
    half = x.shape[-1] // 2
    cos = cos_tab[pos][:, None, :]  # (slots, 1, d)
    sin = sin_tab[pos][:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)


def _paged_attention(q, cache: PagedKVCache, layer: int, table, lens):
    """q: (slots, heads, d) one query per slot; returns (slots, heads, d)."""
    slots, h, d = q.shape
    k, v = gather_slot_kv(cache, layer, table)  # (slots, T, kvh, d)
    kvh = k.shape[2]
    rep = h // kvh
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("shd,sthd->sht", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    t_ids = jnp.arange(k.shape[1])[None, None, :]
    mask = t_ids < lens[:, None, None]
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("sht,sthd->shd", probs, v.astype(jnp.float32))


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def decode_step(params, cache: PagedKVCache, cfg: ModelConfig,
                table, lens, tokens, pos):
    """One token for every slot.

    table: (slots, mpps) int32; lens: (slots,) lengths *including* the
    token being decoded; tokens: (slots,) current input token; pos:
    (slots,) its position (= lens - 1).  Returns (logits, cache).
    """
    page = cache.page_size
    slots = tokens.shape[0]
    x = embed_tokens(params, tokens[:, None])[:, 0]  # (slots, hidden)
    cos_tab, sin_tab = rope_cache(cfg, cfg.max_position_embeddings)
    pages = table[jnp.arange(slots), pos // page]
    offsets = pos % page

    for li, lp in enumerate(params["model"]["layers"]):
        h = rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
        q = apply_linear(lp["self_attn"]["q_proj"], h).reshape(
            slots, cfg.num_heads, cfg.head_dim)
        k = apply_linear(lp["self_attn"]["k_proj"], h).reshape(
            slots, cfg.num_kv_heads, cfg.head_dim)
        v = apply_linear(lp["self_attn"]["v_proj"], h).reshape(
            slots, cfg.num_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, lp["self_attn"]["q_norm"]["weight"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["self_attn"]["k_norm"]["weight"], cfg.rms_norm_eps)
        q = _rope_at(cos_tab, sin_tab, pos, q)
        k = _rope_at(cos_tab, sin_tab, pos, k)
        cache = write_decode(cache, li, pages, offsets, k, v)
        attn = _paged_attention(q, cache, li, table, lens)
        x = x + apply_linear(lp["self_attn"]["o_proj"],
                             attn.reshape(slots, cfg.q_size).astype(x.dtype))
        h2 = rms_norm(x, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        gate = apply_linear(lp["mlp"]["gate_proj"], h2)
        up = apply_linear(lp["mlp"]["up_proj"], h2)
        x = x + apply_linear(lp["mlp"]["down_proj"], jax.nn.silu(gate) * up)

    x = apply_final_norm(params, cfg, x[:, None])[:, 0]
    logits = lm_logits(params, cfg, x[:, None])[:, 0]
    return logits, cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def prefill(params, cache: PagedKVCache, cfg: ModelConfig,
            slot_pages, input_ids, true_len):
    """Process one prompt (padded to a page multiple) and fill its pages.

    slot_pages: (n_pages,) physical pages; input_ids: (1, seq_pad);
    true_len: scalar — returns (last-token logits, cache).
    """
    seq = input_ids.shape[1]
    x = embed_tokens(params, input_ids)
    cos, sin = rope_cache(cfg, seq)
    b = 1
    for li, lp in enumerate(params["model"]["layers"]):
        h = rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
        q = apply_linear(lp["self_attn"]["q_proj"], h).reshape(
            b, seq, cfg.num_heads, cfg.head_dim)
        k = apply_linear(lp["self_attn"]["k_proj"], h).reshape(
            b, seq, cfg.num_kv_heads, cfg.head_dim)
        v = apply_linear(lp["self_attn"]["v_proj"], h).reshape(
            b, seq, cfg.num_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, lp["self_attn"]["q_norm"]["weight"], cfg.rms_norm_eps)
            k = rms_norm(k, lp["self_attn"]["k_norm"]["weight"], cfg.rms_norm_eps)
        from tgq.models.causal_lm import apply_rope, causal_attention

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = write_prefill(cache, li, slot_pages, k[0], v[0])
        attn = causal_attention(q, k, v, impl="naive" if seq < 512 else "auto")
        x = x + apply_linear(lp["self_attn"]["o_proj"],
                             attn.reshape(b, seq, cfg.q_size).astype(x.dtype))
        h2 = rms_norm(x, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        gate = apply_linear(lp["mlp"]["gate_proj"], h2)
        up = apply_linear(lp["mlp"]["up_proj"], h2)
        x = x + apply_linear(lp["mlp"]["down_proj"], jax.nn.silu(gate) * up)

    x = apply_final_norm(params, cfg, x)
    last = x[0, true_len - 1][None, None]
    logits = lm_logits(params, cfg, last)[0, 0]
    return logits, cache
