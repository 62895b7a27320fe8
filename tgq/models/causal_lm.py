"""Pure-JAX decoder-only causal LM (Qwen3 / Llama-3 families).

First-party model definitions replace the reference's dependence on HF
``transformers`` + forward hooks + a ``Catcher`` exception hack
(model_utils.py:122-181).  Because the model is ours, the calibration
pipeline simply calls :func:`embed_tokens` and :func:`decoder_layer`
directly — the layer-sequential structure is the API, not something
scraped out of a foreign module tree.

Parameters are a plain pytree (nested dicts mirroring the HF checkpoint
layout so import is a rename-free mapping).  Every linear is stored as a
dict ``{"w": (out, in)}`` (+ optional ``"b"``) or a
:class:`tgq.core.packing.PackedLinear`; :func:`apply_linear` dispatches,
which is how quantized layers drop into the same forward.

Numerics: weights bf16 (TPU-native; reference uses fp16), activations
bf16 with f32 for RMSNorm/softmax/rope, matching standard JAX LLM
practice.  Attention is blocked causal flash-style on TPU (pallas op)
with a naive masked fallback elsewhere.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tgq.core.packing import PackedLinear
from tgq.models.config import ModelConfig

Params = dict


# ----------------------------------------------------------------- linears


def apply_linear(p, x: jax.Array, layer=None, glu: bool = False) -> jax.Array:
    """x @ Wᵀ (+ b).  p is {"w": (out,in)[, "b": (out,)]} or PackedLinear
    (which routes through the fused dequant-matmul kernel on TPU).

    ``layer``: traced layer index for layer-stacked PackedLinear params
    (3-D codes) — the kernel indexes the stacked weights directly so the
    serving scan never copies a layer's weights (tgq.kernels
    .dequant_matmul).

    ``glu``: x's last dim is 2·in_features holding [gate | up]; the
    matmul input is silu(gate)·up (computed inside the fused kernel on
    the packed path — the silu intermediate never round-trips HBM)."""
    if isinstance(p, PackedLinear):
        from tgq.kernels.dequant_matmul import quantized_matmul

        from tgq.parallel.mesh import quantized_matmul_tp, serving_mesh

        mesh = serving_mesh()
        if mesh is not None and p.tp_kind is not None:
            assert not glu  # TP shards the unfused projection names
            return quantized_matmul_tp(
                x, p, mesh, layer=layer if p.codes.ndim == 3 else None)
        lyr = layer if p.codes.ndim == 3 else None
        if mesh is not None:
            # unmarked packed linear under a mesh: GSPMD cannot
            # partition a pallas call — use the XLA dequant path
            return quantized_matmul(x, p, impl="xla", layer=lyr, glu=glu)
        return quantized_matmul(x, p, layer=lyr, glu=glu)
    w = p["w"]
    if glu:
        n = w.shape[1]
        g, u = x[..., :n], x[..., n:]
        gf = g.astype(jnp.float32)
        x = (gf * jax.lax.logistic(gf) * u.astype(jnp.float32)).astype(
            x.dtype)
    y = x @ w.T.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def linear_weight(p) -> jax.Array:
    """Dense (out, in) view of a linear param (dequantizing if packed)."""
    if isinstance(p, PackedLinear):
        return p.dequantize()
    return p["w"]


# ------------------------------------------------------------------- norms


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(dt)


# -------------------------------------------------------------------- rope


def rope_cache(cfg: ModelConfig, seq_len: int, dtype=jnp.float32):
    """(cos, sin) of shape (seq_len, head_dim), HF rotate-half layout."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # (seq, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (..., seq, n_heads, head_dim); cos/sin: (seq, head_dim)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, None, :].astype(jnp.float32)
    s = sin[:, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    rf = rotated.astype(jnp.float32)
    return (xf * c + rf * s).astype(x.dtype)


# --------------------------------------------------------------- attention


def _naive_causal_attention(q, k, v):
    """q: (b, s, h, d); k, v: (b, s, kv, d).  Returns (b, s, h, d)."""
    b, s, h, d = q.shape
    kv = k.shape[2]
    rep = h // kv
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits * scale
    mask = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(mask[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _flash_causal_attention(q, k, v):
    """TPU pallas flash attention (jax.experimental.pallas.ops.tpu)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    b, s, h, d = q.shape
    kv = k.shape[2]
    rep = h // kv
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    # pallas op wants (b, h, s, d)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = flash_attention(qt, kt, vt, causal=True,
                          sm_scale=float(1.0 / (d ** 0.5)))
    return out.transpose(0, 2, 1, 3)


def causal_attention(q, k, v, impl: str = "auto"):
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "naive"
    if impl == "flash":
        return _flash_causal_attention(q, k, v)
    return _naive_causal_attention(q, k, v)


# ------------------------------------------------------------ decoder layer


def attn_input(lp: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """Input to quantization group 0 (q/k/v_proj; gpt2: c_attn; opt:
    q/k/v_proj after self_attn_layer_norm)."""
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_attn_input

        return gpt2_attn_input(lp, cfg, x)
    if cfg.family == "opt":
        from tgq.models.opt import opt_attn_input

        return opt_attn_input(lp, cfg, x)
    return rms_norm(x, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)


def attn_core(
    lp: Params, cfg: ModelConfig, h: jax.Array, cos, sin, attn_impl: str = "auto"
) -> jax.Array:
    """q/k/v through attention; returns the group-1 input (o_proj /
    gpt2 attn.c_proj), shape (batch, seq, q_size)."""
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_attn_core

        return gpt2_attn_core(lp, cfg, h, attn_impl=attn_impl)
    if cfg.family == "opt":
        from tgq.models.opt import opt_attn_core

        return opt_attn_core(lp, cfg, h, attn_impl=attn_impl)
    b, s, _ = h.shape
    q = apply_linear(lp["self_attn"]["q_proj"], h)
    k = apply_linear(lp["self_attn"]["k_proj"], h)
    v = apply_linear(lp["self_attn"]["v_proj"], h)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = rms_norm(q, lp["self_attn"]["q_norm"]["weight"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["self_attn"]["k_norm"]["weight"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = causal_attention(q, k, v, impl=attn_impl)
    return attn.reshape(b, s, cfg.q_size)


def mlp_input(lp: Params, cfg: ModelConfig, x2: jax.Array) -> jax.Array:
    """Input to quantization group 2 (gate/up_proj; gpt2: c_fc)."""
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_mlp_input

        return gpt2_mlp_input(lp, cfg, x2)
    if cfg.family == "opt":
        from tgq.models.opt import opt_mlp_input

        return opt_mlp_input(lp, cfg, x2)
    return rms_norm(x2, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)


def mlp_act(lp: Params, cfg: ModelConfig, h: jax.Array) -> jax.Array:
    """Group-3 input: silu(gate)·up (gpt2: gelu(c_fc h))."""
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_mlp_act

        return gpt2_mlp_act(lp, cfg, h)
    if cfg.family == "opt":
        from tgq.models.opt import opt_mlp_act

        return opt_mlp_act(lp, cfg, h)
    gate = apply_linear(lp["mlp"]["gate_proj"], h)
    up = apply_linear(lp["mlp"]["up_proj"], h)
    return jax.nn.silu(gate) * up


def attn_out_proj(lp: Params, cfg: ModelConfig, attn: jax.Array) -> jax.Array:
    """Apply the attention output projection (o_proj / gpt2 c_proj)."""
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_attn_out

        return gpt2_attn_out(lp, cfg, attn)
    if cfg.family == "opt":
        from tgq.models.opt import opt_attn_out

        return opt_attn_out(lp, cfg, attn)
    return apply_linear(lp["self_attn"]["o_proj"], attn)


def mlp_out_proj(lp: Params, cfg: ModelConfig, act: jax.Array) -> jax.Array:
    """Apply the MLP output projection (down_proj / gpt2 mlp.c_proj)."""
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_mlp_out

        return gpt2_mlp_out(lp, cfg, act)
    if cfg.family == "opt":
        from tgq.models.opt import opt_mlp_out

        return opt_mlp_out(lp, cfg, act)
    return apply_linear(lp["mlp"]["down_proj"], act)


def decoder_layer(
    lp: Params,
    cfg: ModelConfig,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    attn_impl: str = "auto",
) -> jax.Array:
    """One pre-norm decoder block; x: (batch, seq, hidden)."""
    h = attn_input(lp, cfg, x)
    attn = attn_core(lp, cfg, h, cos, sin, attn_impl=attn_impl)
    x = x + attn_out_proj(lp, cfg, attn)
    h2 = mlp_input(lp, cfg, x)
    x = x + mlp_out_proj(lp, cfg, mlp_act(lp, cfg, h2))
    return x


# -------------------------------------------------------------- full model


def embed_tokens(params: Params, input_ids: jax.Array, dtype=jnp.bfloat16,
                 cfg: Optional[ModelConfig] = None) -> jax.Array:
    if cfg is not None and cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_embed

        return gpt2_embed(params, input_ids, dtype)
    if cfg is not None and cfg.family == "opt":
        from tgq.models.opt import opt_embed

        return opt_embed(params, input_ids, dtype)
    return params["model"]["embed_tokens"]["weight"][input_ids].astype(dtype)


def apply_final_norm(params: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_final_norm

        return gpt2_final_norm(params, cfg, x)
    if cfg.family == "opt":
        from tgq.models.opt import opt_final_norm

        return opt_final_norm(params, cfg, x)
    return rms_norm(x, params["model"]["norm"]["weight"], cfg.rms_norm_eps)


def lm_logits(params: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    if cfg.tie_word_embeddings:
        w = params["model"]["embed_tokens"]["weight"]
    elif isinstance(params["lm_head"], PackedLinear):
        # packed vocab head through the fused dequant-matmul kernel
        # (the vocab matmul reads >1 GB bf16 per decode step otherwise)
        from tgq.kernels.dequant_matmul import quantized_matmul

        head = params["lm_head"]
        from tgq.parallel.mesh import serving_mesh

        if serving_mesh() is not None:
            # under a mesh, GSPMD cannot partition the pallas call;
            # the XLA dequant path shards canonically (vocab on model)
            y = quantized_matmul(x, head, impl="xla",
                                 out_dtype=jnp.float32)
        else:
            y = quantized_matmul(x, head, out_dtype=jnp.float32)
        if head.out_features > cfg.vocab_size:
            # head packed with lane padding (tgq.core.packing.pad_out —
            # keeps the kernel's out-tile at 512 for non-512-multiple
            # vocabs); pad logits are ~0 and must not reach sampling
            y = y[..., : cfg.vocab_size]
        return y
    else:
        w = linear_weight(params["lm_head"])
    return (x.astype(jnp.float32) @ w.T.astype(jnp.float32))


def forward(
    params: Params,
    cfg: ModelConfig,
    input_ids: jax.Array,
    attn_impl: str = "auto",
) -> jax.Array:
    """Full forward, returns (batch, seq, vocab) f32 logits."""
    x = embed_tokens(params, input_ids, cfg=cfg)
    cos, sin = rope_cache(cfg, input_ids.shape[1])
    for lp in params["model"]["layers"]:
        x = decoder_layer(lp, cfg, x, cos, sin, attn_impl=attn_impl)
    x = apply_final_norm(params, cfg, x)
    return lm_logits(params, cfg, x)


def greedy_generate(
    params: Params,
    cfg: ModelConfig,
    prompt_ids,
    max_new_tokens: int,
    attn_impl: str = "auto",
) -> list:
    """Family-agnostic greedy generation via full-recompute ``forward``
    — the documented generation path for gpt2/opt-family models (the
    paged-KV serving engine is the fast llama-family path; README
    §Supported architectures).  One jit for the whole generation:
    causal attention makes positions ≥ i irrelevant to token i's
    logits, so the sequence lives in a fixed (1, L) buffer and a
    ``fori_loop`` fills it — no per-length recompiles.  O(n²·L) — a
    correctness/bring-up path, not a serving path."""
    prompt = list(int(t) for t in prompt_ids)
    n_prompt = len(prompt)
    total = n_prompt + max_new_tokens
    assert total <= cfg.max_position_embeddings, (total, cfg)
    ids0 = jnp.zeros((1, total), jnp.int32).at[0, :n_prompt].set(
        jnp.asarray(prompt, jnp.int32))

    @partial(jax.jit, static_argnames=("n0",))
    def gen(params, ids, n0):
        def body(pos, ids):
            logits = forward(params, cfg, ids, attn_impl=attn_impl)
            nxt = jnp.argmax(logits[0, pos - 1]).astype(jnp.int32)
            return ids.at[0, pos].set(nxt)

        return jax.lax.fori_loop(n0, total, body, ids)

    out = gen(params, ids0, n_prompt)
    return [int(t) for t in np.asarray(out[0, n_prompt:])]


# ---------------------------------------------------------------- init


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16) -> Params:
    """Random init with standard LLM scaling (for tests / synthetic runs)."""
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import init_gpt2_params

        return init_gpt2_params(cfg, key, dtype)
    if cfg.family == "opt":
        from tgq.models.opt import init_opt_params

        return init_opt_params(cfg, key, dtype)
    keys = iter(jax.random.split(key, 16 + cfg.num_layers * 16))

    def dense(out_f, in_f, scale=None):
        if scale is None:
            scale = 1.0 / jnp.sqrt(in_f)
        # generate directly in the target dtype: at 8B scale an f32
        # intermediate doubles host memory and init time
        w = jax.random.normal(next(keys), (out_f, in_f), dtype) * jnp.asarray(
            scale, dtype)
        return {"w": w}

    def maybe_bias(p, out_f):
        if cfg.attention_bias:
            p["b"] = jnp.zeros((out_f,), dtype)
        return p

    layers = []
    for _ in range(cfg.num_layers):
        lp = {
            "input_layernorm": {"weight": jnp.ones((cfg.hidden_size,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((cfg.hidden_size,), dtype)},
            "self_attn": {
                "q_proj": maybe_bias(dense(cfg.q_size, cfg.hidden_size), cfg.q_size),
                "k_proj": maybe_bias(dense(cfg.kv_size, cfg.hidden_size), cfg.kv_size),
                "v_proj": maybe_bias(dense(cfg.kv_size, cfg.hidden_size), cfg.kv_size),
                "o_proj": dense(cfg.hidden_size, cfg.q_size),
            },
            "mlp": {
                "gate_proj": dense(cfg.intermediate_size, cfg.hidden_size),
                "up_proj": dense(cfg.intermediate_size, cfg.hidden_size),
                "down_proj": dense(cfg.hidden_size, cfg.intermediate_size),
            },
        }
        if cfg.qk_norm:
            lp["self_attn"]["q_norm"] = {"weight": jnp.ones((cfg.head_dim,), dtype)}
            lp["self_attn"]["k_norm"] = {"weight": jnp.ones((cfg.head_dim,), dtype)}
        layers.append(lp)

    params: Params = {
        "model": {
            "embed_tokens": {
                "weight": jax.random.normal(
                    next(keys), (cfg.vocab_size, cfg.hidden_size), dtype
                ) * jnp.asarray(0.02, dtype)
            },
            "layers": layers,
            "norm": {"weight": jnp.ones((cfg.hidden_size,), dtype)},
        }
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(cfg.vocab_size, cfg.hidden_size, scale=0.02)
    return params


# ------------------------------------------------- quantization plumbing


def sequenced_groups(cfg: ModelConfig) -> list[list[str]]:
    """Quantization order within a decoder layer — 4 sequential groups that
    share one input Hessian each (reference model_utils.py:77-108)."""
    if cfg.family == "gpt2":
        from tgq.models.gpt2 import gpt2_sequenced_groups

        return gpt2_sequenced_groups(cfg)
    if cfg.family == "opt":
        from tgq.models.opt import opt_sequenced_groups

        return opt_sequenced_groups(cfg)
    return [
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
        ["self_attn.o_proj"],
        ["mlp.gate_proj", "mlp.up_proj"],
        ["mlp.down_proj"],
    ]


def find_linear_paths(cfg: ModelConfig) -> list[str]:
    """All quantizable linears in one decoder layer."""
    return [name for group in sequenced_groups(cfg) for name in group]


def get_nested(tree: Params, dotted: str):
    cur = tree
    for part in dotted.split("."):
        cur = cur[part]
    return cur


def set_nested(tree: Params, dotted: str, value) -> None:
    parts = dotted.split(".")
    cur = tree
    for part in parts[:-1]:
        cur = cur[part]
    cur[parts[-1]] = value
