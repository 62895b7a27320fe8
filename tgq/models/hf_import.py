"""HF checkpoint import: safetensors → tgq param tree (no torch).

The reference loads models through ``transformers`` + CUDA
(model_utils.py:23-51); here checkpoints are read straight from
safetensors shards into the JAX param tree (the tree layout intentionally
mirrors HF names, so import is a mechanical rename: ``*.weight`` → ``w``).
Works fully offline from a local directory.
"""
from __future__ import annotations

import json
import logging
import os
from functools import partial
from typing import Optional

import numpy as np

from tgq.models.config import ModelConfig, PRESETS

logger = logging.getLogger(__name__)


def config_from_hf(hf_cfg: dict) -> ModelConfig:
    model_type = hf_cfg.get("model_type", "")
    if model_type == "gpt2":
        # transformer.h layout: n_* config names, Conv1D weights
        h = hf_cfg["n_embd"]
        return ModelConfig(
            name=hf_cfg.get("_name_or_path") or "gpt2",
            vocab_size=hf_cfg["vocab_size"], hidden_size=h,
            intermediate_size=hf_cfg.get("n_inner") or 4 * h,
            num_layers=hf_cfg["n_layer"], num_heads=hf_cfg["n_head"],
            num_kv_heads=hf_cfg["n_head"], head_dim=h // hf_cfg["n_head"],
            rms_norm_eps=hf_cfg.get("layer_norm_epsilon", 1e-5),
            qk_norm=False, tie_word_embeddings=True,
            max_position_embeddings=hf_cfg.get("n_positions", 1024),
            seqlen=min(2048, hf_cfg.get("n_positions", 1024)),
            family="gpt2",
        )
    if model_type == "opt":
        # model.decoder.layers layout (reference model_utils.py:60-63)
        h = hf_cfg["hidden_size"]
        if hf_cfg.get("word_embed_proj_dim", h) != h:
            raise ValueError(
                "OPT variants with word_embed_proj_dim != hidden_size "
                "(project_in/out, e.g. opt-350m) are not supported")
        if not hf_cfg.get("do_layer_norm_before", True):
            raise ValueError(
                "post-norm OPT variants (do_layer_norm_before=False, "
                "e.g. opt-350m) are not supported")
        heads = hf_cfg["num_attention_heads"]
        return ModelConfig(
            name=hf_cfg.get("_name_or_path") or "opt",
            vocab_size=hf_cfg["vocab_size"], hidden_size=h,
            intermediate_size=hf_cfg.get("ffn_dim") or 4 * h,
            num_layers=hf_cfg["num_hidden_layers"], num_heads=heads,
            num_kv_heads=heads, head_dim=h // heads,
            rms_norm_eps=1e-5, qk_norm=False,
            tie_word_embeddings=hf_cfg.get("tie_word_embeddings", True),
            max_position_embeddings=hf_cfg.get("max_position_embeddings",
                                               2048),
            seqlen=min(2048, hf_cfg.get("max_position_embeddings", 2048)),
            family="opt",
        )
    qk_norm = model_type == "qwen3"
    head_dim = hf_cfg.get("head_dim") or (
        hf_cfg["hidden_size"] // hf_cfg["num_attention_heads"]
    )
    return ModelConfig(
        name=hf_cfg.get("_name_or_path", model_type) or model_type,
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        num_kv_heads=hf_cfg.get("num_key_value_heads",
                                hf_cfg["num_attention_heads"]),
        head_dim=head_dim,
        rope_theta=hf_cfg.get("rope_theta", 1e4),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
        qk_norm=qk_norm,
        attention_bias=hf_cfg.get("attention_bias", model_type == "qwen2"),
        tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
        max_position_embeddings=hf_cfg.get("max_position_embeddings", 40960),
    )


def _iter_safetensor_shards(path: str):
    from safetensors import safe_open

    index_path = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    else:
        shards = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def _map_gpt2_tensor(key: str, tensor, dtype):
    """HF GPT-2 name → tgq tree (tgq.models.gpt2 layout docstring).

    transformer.wte → model.embed_tokens, wpe → model.wpe, h.N →
    model.layers.N, ln_f → model.norm.  HF Conv1D stores (in, out) —
    linear weights transpose to the (out, in) ``w`` convention; the
    causal-mask buffers (attn.bias/attn.masked_bias) are dropped.
    Returns (dotted_name, array) or None to skip."""
    if key.endswith(("attn.bias", "attn.masked_bias")):
        return None
    name = key
    if name.startswith("transformer."):
        name = name[len("transformer."):]
    if name.startswith("wte."):
        name = "model.embed_tokens." + name[len("wte."):]
    elif name.startswith("wpe."):
        name = "model.wpe." + name[len("wpe."):]
    elif name.startswith("ln_f."):
        name = "model.norm." + name[len("ln_f."):]
    elif name.startswith("h."):
        name = "model.layers." + name[len("h."):]
    elif name.startswith("lm_head."):
        return None  # tied to wte
    arr = np.asarray(tensor)
    if arr.dtype.kind == "f":
        arr = arr.astype(dtype)
    parts = name.split(".")
    if len(parts) >= 2 and parts[-2] in ("c_attn", "c_proj", "c_fc"):
        if parts[-1] == "weight":
            return name.rsplit(".", 1)[0] + ".w", np.ascontiguousarray(arr.T)
        if parts[-1] == "bias":
            return name.rsplit(".", 1)[0] + ".b", arr
    return name, arr


def _map_opt_tensor(key: str, tensor, dtype):
    """HF OPT name → tgq tree (tgq.models.opt layout docstring).

    model.decoder.embed_tokens → model.embed_tokens, embed_positions →
    model.wpe (offset rows kept), decoder.final_layer_norm →
    model.norm, decoder.layers.N → model.layers.N.  OPT projections are
    true nn.Linear (out, in) — no Conv1D transpose; ``weight``/``bias``
    rename to ``w``/``b`` on the quantizable linears only.
    Returns (dotted_name, array) or None to skip."""
    name = key
    if name.startswith("model.decoder."):
        name = "model." + name[len("model.decoder."):]
    elif name.startswith("decoder."):
        name = "model." + name[len("decoder."):]
    if name.startswith("model.embed_positions."):
        name = "model.wpe." + name[len("model.embed_positions."):]
    elif name.startswith("model.final_layer_norm."):
        name = "model.norm." + name[len("model.final_layer_norm."):]
    elif name.startswith("lm_head."):
        return None  # tied to embed_tokens
    arr = np.asarray(tensor)
    if arr.dtype.kind == "f":
        arr = arr.astype(dtype)
    parts = name.split(".")
    if len(parts) >= 2 and parts[-2] in ("q_proj", "k_proj", "v_proj",
                                         "out_proj", "fc1", "fc2"):
        if parts[-1] == "weight":
            return name.rsplit(".", 1)[0] + ".w", arr
        if parts[-1] == "bias":
            return name.rsplit(".", 1)[0] + ".b", arr
    return name, arr


def load_hf_checkpoint(path: str, dtype=None):
    """(params, ModelConfig) from a local HF checkpoint directory."""
    import ml_dtypes

    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    if dtype is None:
        dtype = ml_dtypes.bfloat16

    layers: list[dict] = [dict() for _ in range(cfg.num_layers)]
    params: dict = {"model": {"layers": layers}}

    def put(dotted: str, arr: np.ndarray):
        parts = dotted.split(".")
        cur: dict = params
        for i, part in enumerate(parts[:-1]):
            if part.isdigit():
                cur = cur[int(part)]
            else:
                cur = cur.setdefault(part, {})
        cur[parts[-1]] = arr

    n_tensors = 0
    for key, tensor in _iter_safetensor_shards(path):
        if cfg.family in ("gpt2", "opt"):
            mapper = (_map_gpt2_tensor if cfg.family == "gpt2"
                      else _map_opt_tensor)
            mapped = mapper(key, tensor, dtype)
            if mapped is not None:
                put(*mapped)
                n_tensors += 1
            continue
        arr = np.asarray(tensor)
        if arr.dtype.kind == "f":
            arr = arr.astype(dtype)
        parts = key.split(".")
        is_proj = len(parts) >= 2 and (
            parts[-2].endswith("_proj") or key == "lm_head.weight"
        )
        if is_proj and parts[-1] == "weight":
            put(key.rsplit(".", 1)[0] + ".w", arr)
        elif is_proj and parts[-1] == "bias":
            put(key.rsplit(".", 1)[0] + ".b", arr)
        else:
            put(key, arr)
        n_tensors += 1
    logger.info("[hf] imported %d tensors from %s", n_tensors, path)
    if cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    return params, cfg


def init_params_host(cfg: ModelConfig, seed: int = 0):
    """Random init as host numpy bf16 — PCG64 streams ~GB/s where jax's
    threefry on a 2-core host takes tens of minutes for an 8B model.
    Content-equivalent for synthetic benchmarks; real runs import HF
    checkpoints."""
    import ml_dtypes

    rng = np.random.default_rng(seed)

    def dense(out_f, in_f, scale=None):
        scale = scale if scale is not None else 1.0 / np.sqrt(in_f)
        w = (rng.standard_normal((out_f, in_f), dtype=np.float32) * scale)
        return {"w": w.astype(ml_dtypes.bfloat16)}

    ones = lambda n: np.ones((n,), ml_dtypes.bfloat16)  # noqa: E731
    layers = []
    for _ in range(cfg.num_layers):
        lp = {
            "input_layernorm": {"weight": ones(cfg.hidden_size)},
            "post_attention_layernorm": {"weight": ones(cfg.hidden_size)},
            "self_attn": {
                "q_proj": dense(cfg.q_size, cfg.hidden_size),
                "k_proj": dense(cfg.kv_size, cfg.hidden_size),
                "v_proj": dense(cfg.kv_size, cfg.hidden_size),
                "o_proj": dense(cfg.hidden_size, cfg.q_size),
            },
            "mlp": {
                "gate_proj": dense(cfg.intermediate_size, cfg.hidden_size),
                "up_proj": dense(cfg.intermediate_size, cfg.hidden_size),
                "down_proj": dense(cfg.hidden_size, cfg.intermediate_size),
            },
        }
        if cfg.attention_bias:
            for p in ("q_proj", "k_proj", "v_proj"):
                out_f = cfg.q_size if p == "q_proj" else cfg.kv_size
                lp["self_attn"][p]["b"] = np.zeros((out_f,), ml_dtypes.bfloat16)
        if cfg.qk_norm:
            lp["self_attn"]["q_norm"] = {"weight": ones(cfg.head_dim)}
            lp["self_attn"]["k_norm"] = {"weight": ones(cfg.head_dim)}
        layers.append(lp)
    params = {
        "model": {
            "embed_tokens": {"weight": dense(cfg.vocab_size, cfg.hidden_size,
                                             scale=0.02)["w"]},
            "layers": layers,
            "norm": {"weight": ones(cfg.hidden_size)},
        }
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(cfg.vocab_size, cfg.hidden_size, scale=0.02)
    return params


def init_packed_params(cfg: ModelConfig, spec, seed: int = 0,
                       lm_head_bits: int = 16):
    """Random-init a preset directly as packed-INT weights (RTN), with
    generation *and* packing jitted on the default device.

    For serving benchmarks of big presets this replaces host RNG (tens
    of GB through a 2-core host) and the dense host→device transfer: per
    linear, only the packed codes (bits/8 bytes per weight) ever exist
    outside the jit.  Content-equivalent to init_params + on-the-fly RTN
    pack of the same spec (same RTN grid), not bit-identical to the host
    path (different RNG streams).
    """
    import jax
    import jax.numpy as jnp

    from tgq.core.packing import PackedLinear
    from tgq.core.quant import expand_params, find_params, quantize
    from tgq.models.causal_lm import set_nested

    @partial(jax.jit, static_argnames=("out_f", "in_f"))
    def packed_dense(key, out_f, in_f):
        w = jax.random.normal(key, (out_f, in_f), jnp.float32) * (
            1.0 / float(np.sqrt(in_f)))
        p = find_params(w, spec)
        s, z = expand_params(p, in_f)
        q = quantize(w, s, z, spec).astype(jnp.int32)
        return PackedLinear.from_codes(q, p.scale, p.zero, spec)

    @partial(jax.jit, static_argnames=("out_f", "in_f", "scale"))
    def dense(key, out_f, in_f, scale):
        return jax.random.normal(key, (out_f, in_f), jnp.bfloat16
                                 ) * jnp.bfloat16(scale)

    root = jax.random.key(seed)
    ones = lambda n: jnp.ones((n,), jnp.bfloat16)  # noqa: E731
    layers = []
    kidx = 0
    for _ in range(cfg.num_layers):
        lp = {
            "input_layernorm": {"weight": ones(cfg.hidden_size)},
            "post_attention_layernorm": {"weight": ones(cfg.hidden_size)},
            "self_attn": {}, "mlp": {},
        }
        shapes = {
            "self_attn.q_proj": (cfg.q_size, cfg.hidden_size),
            "self_attn.k_proj": (cfg.kv_size, cfg.hidden_size),
            "self_attn.v_proj": (cfg.kv_size, cfg.hidden_size),
            "self_attn.o_proj": (cfg.hidden_size, cfg.q_size),
            "mlp.gate_proj": (cfg.intermediate_size, cfg.hidden_size),
            "mlp.up_proj": (cfg.intermediate_size, cfg.hidden_size),
            "mlp.down_proj": (cfg.hidden_size, cfg.intermediate_size),
        }
        for name, (out_f, in_f) in shapes.items():
            kidx += 1
            set_nested(lp, name,
                       packed_dense(jax.random.fold_in(root, kidx), out_f, in_f))
        if cfg.attention_bias:
            raise NotImplementedError(
                "packed random init with attention bias: use init_params + "
                "on-the-fly packing")
        if cfg.qk_norm:
            lp["self_attn"]["q_norm"] = {"weight": ones(cfg.head_dim)}
            lp["self_attn"]["k_norm"] = {"weight": ones(cfg.head_dim)}
        layers.append(lp)
    kidx += 1
    params = {
        "model": {
            "embed_tokens": {"weight": dense(jax.random.fold_in(root, kidx),
                                             cfg.vocab_size, cfg.hidden_size,
                                             0.02)},
            "layers": layers,
            "norm": {"weight": ones(cfg.hidden_size)},
        }
    }
    if not cfg.tie_word_embeddings:
        kidx += 1
        if lm_head_bits < 16:
            from tgq.core.quant import QuantSpec

            head_spec = QuantSpec(bits=lm_head_bits,
                                  group_size=spec.group_size, sym=False)

            @partial(jax.jit, static_argnames=("out_f", "in_f"))
            def packed_head(key, out_f, in_f):
                w = jax.random.normal(key, (out_f, in_f), jnp.float32) * 0.02
                p = find_params(w, head_spec)
                s, z = expand_params(p, in_f)
                q = quantize(w, s, z, head_spec).astype(jnp.int32)
                return PackedLinear.from_codes(q, p.scale, p.zero, head_spec)

            from tgq.core.packing import pad_out

            # lane-pad the vocab dim so the fused kernel keeps its wide
            # out tile (151936 is not a 512 multiple); lm_logits slices
            params["lm_head"] = pad_out(packed_head(
                jax.random.fold_in(root, kidx), cfg.vocab_size,
                cfg.hidden_size))
        else:
            params["lm_head"] = {"w": dense(jax.random.fold_in(root, kidx),
                                            cfg.vocab_size, cfg.hidden_size,
                                            0.02)}
    return params


def resolve_model(model_id: str, seed: int = 0):
    """Model resolution: tgq preset (random init) | local HF dir | HF hub id
    (requires local HF cache — this container has no network)."""
    import jax

    from tgq.models.causal_lm import init_params

    if model_id in PRESETS:
        cfg = PRESETS[model_id]
        logger.info("[model] preset %s (random init)", model_id)
        n_params = cfg.num_layers * (
            cfg.hidden_size * (cfg.q_size + 2 * cfg.kv_size + cfg.hidden_size)
            + 3 * cfg.hidden_size * cfg.intermediate_size
        )
        if n_params > 1e9:
            return init_params_host(cfg, seed), cfg, None
        return init_params(cfg, jax.random.key(seed)), cfg, None

    if os.path.isdir(model_id):
        params, cfg = load_hf_checkpoint(model_id)
        tokenizer = None
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_id)
        except Exception:
            logger.warning("[model] no tokenizer loadable from %s", model_id)
        return params, cfg, tokenizer

    # HF hub id — only resolvable from local caches
    from transformers import AutoTokenizer
    from huggingface_hub import snapshot_download

    try:
        local = snapshot_download(model_id, local_files_only=True)
    except Exception as e:
        raise ValueError(
            f"model_id {model_id!r} is not a tgq preset "
            f"({', '.join(sorted(PRESETS))}), not a local directory, and "
            f"not resolvable from the local HF cache: {e}"
        ) from e
    params, cfg = load_hf_checkpoint(local)
    tokenizer = AutoTokenizer.from_pretrained(model_id, local_files_only=True)
    return params, cfg, tokenizer
