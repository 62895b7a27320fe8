"""GPT-2 family: the transformer.h decoder layout.

Structurally different from the llama family (tgq.models.causal_lm):
LayerNorm with bias (not RMSNorm), fused QKV in one ``attn.c_attn``
linear, GELU MLP (``mlp.c_fc`` → ``mlp.c_proj``), learned position
embeddings instead of rope, tied lm head.  The reference adapts this
layout through ``model.transformer.h`` (reference model_utils.py:54-74);
here it is a first-party definition sharing the llama family's staged
calibration protocol — the four sequential quantization groups map to
[c_attn] → [attn.c_proj] → [c_fc] → [mlp.c_proj].

Tree layout (the pipeline's ``model.layers`` skeleton with GPT-2 module
names inside; hf_import maps ``transformer.h.N.*`` here and transposes
HF Conv1D weights to the (out, in) convention):

  model.embed_tokens.weight   (wte)
  model.wpe.weight
  model.layers[i].ln_1.{weight,bias}
  model.layers[i].attn.c_attn  {"w": (3h, h), "b": (3h,)}
  model.layers[i].attn.c_proj  {"w": (h, h),  "b": (h,)}
  model.layers[i].ln_2.{weight,bias}
  model.layers[i].mlp.c_fc     {"w": (4h, h), "b": (4h,)}
  model.layers[i].mlp.c_proj   {"w": (h, 4h), "b": (h,)}
  model.norm.{weight,bias}     (ln_f)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tgq.models.config import ModelConfig

Params = dict


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dt)


def gpt2_embed(params: Params, input_ids: jax.Array,
               dtype=jnp.bfloat16) -> jax.Array:
    """wte[ids] + wpe[positions]."""
    wte = params["model"]["embed_tokens"]["weight"]
    wpe = params["model"]["wpe"]["weight"]
    seq = input_ids.shape[-1]
    return (wte[input_ids] + wpe[:seq][None]).astype(dtype)


def gpt2_attn_input(lp: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """ln_1(x) — the c_attn (group 0) input."""
    return layer_norm(x, lp["ln_1"]["weight"], lp["ln_1"]["bias"],
                      cfg.rms_norm_eps)


def gpt2_attn_core(lp: Params, cfg: ModelConfig, h: jax.Array,
                   attn_impl: str = "auto") -> jax.Array:
    """Fused-QKV causal attention; returns the attn.c_proj (group 1)
    input, shape (batch, seq, hidden)."""
    from tgq.models.causal_lm import apply_linear, causal_attention

    b, s, _ = h.shape
    qkv = apply_linear(lp["attn"]["c_attn"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_heads, cfg.head_dim)
    attn = causal_attention(q, k, v, impl=attn_impl)
    return attn.reshape(b, s, cfg.hidden_size)


def gpt2_attn_out(lp: Params, cfg: ModelConfig, attn: jax.Array) -> jax.Array:
    from tgq.models.causal_lm import apply_linear

    return apply_linear(lp["attn"]["c_proj"], attn)


def gpt2_mlp_input(lp: Params, cfg: ModelConfig, x2: jax.Array) -> jax.Array:
    """ln_2(x2) — the mlp.c_fc (group 2) input."""
    return layer_norm(x2, lp["ln_2"]["weight"], lp["ln_2"]["bias"],
                      cfg.rms_norm_eps)


def gpt2_mlp_act(lp: Params, cfg: ModelConfig, h2: jax.Array) -> jax.Array:
    """gelu(c_fc(h2)) — the mlp.c_proj (group 3) input."""
    from tgq.models.causal_lm import apply_linear

    return jax.nn.gelu(apply_linear(lp["mlp"]["c_fc"], h2),
                       approximate=True)


def gpt2_mlp_out(lp: Params, cfg: ModelConfig, act: jax.Array) -> jax.Array:
    from tgq.models.causal_lm import apply_linear

    return apply_linear(lp["mlp"]["c_proj"], act)


def gpt2_decoder_layer(lp: Params, cfg: ModelConfig, x: jax.Array,
                       attn_impl: str = "auto") -> jax.Array:
    h = gpt2_attn_input(lp, cfg, x)
    x = x + gpt2_attn_out(lp, cfg, gpt2_attn_core(lp, cfg, h,
                                                  attn_impl=attn_impl))
    h2 = gpt2_mlp_input(lp, cfg, x)
    x = x + gpt2_mlp_out(lp, cfg, gpt2_mlp_act(lp, cfg, h2))
    return x


def gpt2_final_norm(params: Params, cfg: ModelConfig,
                    x: jax.Array) -> jax.Array:
    n = params["model"]["norm"]
    return layer_norm(x, n["weight"], n["bias"], cfg.rms_norm_eps)


def gpt2_sequenced_groups(cfg: ModelConfig) -> list[list[str]]:
    """Four sequential quantization groups sharing one Hessian each —
    the transformer.h analog of the reference's q/k/v→o→gate/up→down
    scheme (model_utils.py:77-108); c_attn is already fused."""
    return [["attn.c_attn"], ["attn.c_proj"], ["mlp.c_fc"],
            ["mlp.c_proj"]]


def init_gpt2_params(cfg: ModelConfig, key: jax.Array,
                     dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, 4 + cfg.num_layers * 4))

    def dense(out_f, in_f, scale=None):
        if scale is None:
            scale = 1.0 / jnp.sqrt(in_f)
        w = jax.random.normal(next(keys), (out_f, in_f), dtype) * jnp.asarray(
            scale, dtype)
        return {"w": w, "b": jnp.zeros((out_f,), dtype)}

    def ln(n):
        return {"weight": jnp.ones((n,), dtype),
                "bias": jnp.zeros((n,), dtype)}

    h = cfg.hidden_size
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln_1": ln(h),
            "attn": {"c_attn": dense(3 * h, h), "c_proj": dense(h, h)},
            "ln_2": ln(h),
            "mlp": {"c_fc": dense(cfg.intermediate_size, h),
                    "c_proj": dense(h, cfg.intermediate_size)},
        })
    return {
        "model": {
            "embed_tokens": {"weight": jax.random.normal(
                next(keys), (cfg.vocab_size, h), dtype) * jnp.asarray(
                    0.02, dtype)},
            "wpe": {"weight": jax.random.normal(
                next(keys), (cfg.max_position_embeddings, h), dtype
            ) * jnp.asarray(0.01, dtype)},
            "layers": layers,
            "norm": ln(h),
        }
    }
