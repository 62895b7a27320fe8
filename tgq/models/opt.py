"""OPT family: the ``model.decoder.layers`` layout.

The reference adapts this family through its second get_layers branch
(reference model_utils.py:60-63, ``model.model.decoder.layers``); here
it is a first-party definition, the third structurally distinct family
after llama (tgq.models.causal_lm) and gpt2 (tgq.models.gpt2):
LayerNorm with bias, *unfused* q/k/v/out projections all carrying
biases, MHA (no GQA), learned position embeddings with the HF OPT
**+2 offset** (no rope), and a ReLU fc1→fc2 MLP.  Shares the llama
family's staged calibration protocol — the four sequential quantization
groups are [q,k,v_proj] → [out_proj] → [fc1] → [fc2].

Tree layout (the pipeline's ``model.layers`` skeleton with OPT module
names inside; hf_import maps ``model.decoder.*`` here — OPT projections
are true nn.Linear (out, in), so no Conv1D transpose):

  model.embed_tokens.weight      (decoder.embed_tokens)
  model.wpe.weight               (decoder.embed_positions, rows 0..1
                                  are the HF offset padding)
  model.layers[i].self_attn_layer_norm.{weight,bias}
  model.layers[i].self_attn.{q,k,v,out}_proj  {"w", "b"}
  model.layers[i].final_layer_norm.{weight,bias}
  model.layers[i].fc1  {"w": (4h, h), "b"}
  model.layers[i].fc2  {"w": (h, 4h), "b"}
  model.norm.{weight,bias}       (decoder.final_layer_norm)

Scope: the pre-norm variants with word_embed_proj_dim == hidden_size
(125m/1.3b/2.7b/6.7b/13b/30b/66b).  OPT-350m (post-norm +
project_in/out) is rejected at import with a clear error.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tgq.models.config import ModelConfig
from tgq.models.gpt2 import layer_norm

Params = dict

_POS_OFFSET = 2  # HF OPTLearnedPositionalEmbedding: positions + 2


def opt_embed(params: Params, input_ids: jax.Array,
              dtype=jnp.bfloat16) -> jax.Array:
    """wte[ids] + wpe[positions + 2] (full-sequence positions)."""
    wte = params["model"]["embed_tokens"]["weight"]
    wpe = params["model"]["wpe"]["weight"]
    seq = input_ids.shape[-1]
    return (wte[input_ids]
            + wpe[_POS_OFFSET:_POS_OFFSET + seq][None]).astype(dtype)


def opt_attn_input(lp: Params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """self_attn_layer_norm(x) — the q/k/v (group 0) input."""
    n = lp["self_attn_layer_norm"]
    return layer_norm(x, n["weight"], n["bias"], cfg.rms_norm_eps)


def opt_attn_core(lp: Params, cfg: ModelConfig, h: jax.Array,
                  attn_impl: str = "auto") -> jax.Array:
    """q/k/v through causal attention (no rope); returns the out_proj
    (group 1) input, shape (batch, seq, hidden)."""
    from tgq.models.causal_lm import apply_linear, causal_attention

    b, s, _ = h.shape
    q = apply_linear(lp["self_attn"]["q_proj"], h)
    k = apply_linear(lp["self_attn"]["k_proj"], h)
    v = apply_linear(lp["self_attn"]["v_proj"], h)
    q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_heads, cfg.head_dim)
    attn = causal_attention(q, k, v, impl=attn_impl)
    return attn.reshape(b, s, cfg.hidden_size)


def opt_attn_out(lp: Params, cfg: ModelConfig, attn: jax.Array) -> jax.Array:
    from tgq.models.causal_lm import apply_linear

    return apply_linear(lp["self_attn"]["out_proj"], attn)


def opt_mlp_input(lp: Params, cfg: ModelConfig, x2: jax.Array) -> jax.Array:
    """final_layer_norm(x2) — the fc1 (group 2) input."""
    n = lp["final_layer_norm"]
    return layer_norm(x2, n["weight"], n["bias"], cfg.rms_norm_eps)


def opt_mlp_act(lp: Params, cfg: ModelConfig, h2: jax.Array) -> jax.Array:
    """relu(fc1(h2)) — the fc2 (group 3) input."""
    from tgq.models.causal_lm import apply_linear

    return jax.nn.relu(apply_linear(lp["fc1"], h2))


def opt_mlp_out(lp: Params, cfg: ModelConfig, act: jax.Array) -> jax.Array:
    from tgq.models.causal_lm import apply_linear

    return apply_linear(lp["fc2"], act)


def opt_final_norm(params: Params, cfg: ModelConfig,
                   x: jax.Array) -> jax.Array:
    n = params["model"]["norm"]
    return layer_norm(x, n["weight"], n["bias"], cfg.rms_norm_eps)


def opt_sequenced_groups(cfg: ModelConfig) -> list[list[str]]:
    """Four sequential quantization groups sharing one Hessian each —
    the decoder.layers analog of the reference's q/k/v→o→gate/up→down
    scheme (reference model_utils.py:77-108)."""
    return [
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
        ["self_attn.out_proj"],
        ["fc1"],
        ["fc2"],
    ]


def init_opt_params(cfg: ModelConfig, key: jax.Array,
                    dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, 4 + cfg.num_layers * 8))

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
            "self_attn_layer_norm": ln(h),
            "self_attn": {
                "q_proj": dense(h, h), "k_proj": dense(h, h),
                "v_proj": dense(h, h), "out_proj": dense(h, h),
            },
            "final_layer_norm": ln(h),
            "fc1": dense(cfg.intermediate_size, h),
            "fc2": dense(h, cfg.intermediate_size),
        })
    return {
        "model": {
            "embed_tokens": {"weight": jax.random.normal(
                next(keys), (cfg.vocab_size, h), dtype) * jnp.asarray(
                    0.02, dtype)},
            "wpe": {"weight": jax.random.normal(
                next(keys),
                (cfg.max_position_embeddings + _POS_OFFSET, h), dtype
            ) * jnp.asarray(0.01, dtype)},
            "layers": layers,
            "norm": ln(h),
        }
    }
