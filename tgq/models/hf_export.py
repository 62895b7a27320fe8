"""HF-format export of quantized models (dequantized bf16 safetensors).

The reference persists its quantized model with ``save_pretrained`` +
tokenizer (reference quantize.py:262-275) so the artifact loads anywhere
in the HF ecosystem — its "quantized" weights are fake-quant fp16 values
written back in place.  tgq's primary checkpoint is the packed-INT npz
(tgq.core.checkpoint), but this module provides the same interop
artifact: dequantized-bf16 ``model.safetensors`` + HF ``config.json``
(+ tokenizer files when available), loadable by transformers/vLLM and by
our own :func:`tgq.models.hf_import.load_hf_checkpoint` for roundtrip
validation.
"""
from __future__ import annotations

import json
import logging
import os

import numpy as np

from tgq.core.packing import PackedLinear
from tgq.models.config import ModelConfig

logger = logging.getLogger(__name__)

_MAX_SHARD_BYTES = 4 * 1024**3  # HF convention: ~4 GB shards


def hf_config_dict(cfg: ModelConfig) -> dict:
    """ModelConfig → HF config.json dict (inverse of
    hf_import.config_from_hf).  model_type is derived from the feature
    flags: family "gpt2" ⇒ gpt2, qk_norm ⇒ qwen3, attention_bias ⇒
    qwen2, else llama."""
    if cfg.family == "gpt2":
        return {
            "model_type": "gpt2",
            "architectures": ["GPT2LMHeadModel"],
            "vocab_size": cfg.vocab_size,
            "n_embd": cfg.hidden_size,
            "n_inner": cfg.intermediate_size,
            "n_layer": cfg.num_layers,
            "n_head": cfg.num_heads,
            "n_positions": cfg.max_position_embeddings,
            "n_ctx": cfg.max_position_embeddings,
            "layer_norm_epsilon": cfg.rms_norm_eps,
            "activation_function": "gelu_new",
            "tie_word_embeddings": True,
            "torch_dtype": "bfloat16",
            "_name_or_path": cfg.name,
        }
    if cfg.family == "opt":
        return {
            "model_type": "opt",
            "architectures": ["OPTForCausalLM"],
            "vocab_size": cfg.vocab_size,
            "hidden_size": cfg.hidden_size,
            "ffn_dim": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "max_position_embeddings": cfg.max_position_embeddings,
            "word_embed_proj_dim": cfg.hidden_size,
            "do_layer_norm_before": True,
            "activation_function": "relu",
            "tie_word_embeddings": True,
            "torch_dtype": "bfloat16",
            "_name_or_path": cfg.name,
        }
    if cfg.qk_norm:
        model_type = "qwen3"
        architectures = ["Qwen3ForCausalLM"]
    elif cfg.attention_bias:
        model_type = "qwen2"
        architectures = ["Qwen2ForCausalLM"]
    else:
        model_type = "llama"
        architectures = ["LlamaForCausalLM"]
    return {
        "model_type": model_type,
        "architectures": architectures,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "attention_bias": cfg.attention_bias,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "max_position_embeddings": cfg.max_position_embeddings,
        "hidden_act": "silu",
        "torch_dtype": "bfloat16",
        "_name_or_path": cfg.name,
    }


def _hf_state_dict(params, dtype) -> dict[str, np.ndarray]:
    """Flatten the tgq param tree to HF tensor names, dequantizing
    PackedLinear leaves.  Inverse of hf_import.load_hf_checkpoint's
    renames: ``w`` → ``weight``, ``b`` → ``bias``."""
    out: dict[str, np.ndarray] = {}

    def walk(node, prefix: str):
        if isinstance(node, PackedLinear):
            w = np.asarray(node.dequantize()).astype(dtype)
            out[f"{prefix}.weight"] = w
            if node.bias is not None:
                out[f"{prefix}.bias"] = np.asarray(node.bias).astype(dtype)
            return
        if isinstance(node, dict):
            if "w" in node:  # dense linear
                out[f"{prefix}.weight"] = np.asarray(node["w"]).astype(dtype)
                if "b" in node:
                    out[f"{prefix}.bias"] = np.asarray(node["b"]).astype(dtype)
                return
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
            return
        if isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}")
            return
        arr = np.asarray(node)
        if arr.dtype.kind in "fV":  # V: numpy views of bf16
            arr = arr.astype(dtype)
        out[prefix] = arr

    walk(params, "")
    return out


def _gpt2_rename(name: str) -> str:
    """tgq gpt2 tree name → HF ``transformer.*`` name (inverse of
    hf_import._map_gpt2_tensor)."""
    if name.startswith("model.embed_tokens."):
        return "transformer.wte." + name[len("model.embed_tokens."):]
    if name.startswith("model.wpe."):
        return "transformer.wpe." + name[len("model.wpe."):]
    if name.startswith("model.norm."):
        return "transformer.ln_f." + name[len("model.norm."):]
    if name.startswith("model.layers."):
        return "transformer.h." + name[len("model.layers."):]
    return name


def _gpt2_state_dict(params, dtype) -> dict[str, np.ndarray]:
    """gpt2-family flatten: HF Conv1D modules (c_attn/c_proj/c_fc) store
    (in, out) — re-transpose the (out, in) ``w`` convention back (the
    exact inverse of hf_import._map_gpt2_tensor's import transpose)."""
    state = _hf_state_dict(params, dtype)
    out: dict[str, np.ndarray] = {}
    for name, arr in state.items():
        parts = name.split(".")
        if (len(parts) >= 2 and parts[-1] == "weight"
                and parts[-2] in ("c_attn", "c_proj", "c_fc")):
            arr = np.ascontiguousarray(arr.T)
        out[_gpt2_rename(name)] = arr
    return out


def _opt_rename(name: str) -> str:
    """tgq opt tree name → HF ``model.decoder.*`` name (inverse of
    hf_import._map_opt_tensor).  OPT projections are nn.Linear — no
    transpose needed."""
    if name.startswith("model.embed_tokens."):
        return ("model.decoder.embed_tokens."
                + name[len("model.embed_tokens."):])
    if name.startswith("model.wpe."):
        return "model.decoder.embed_positions." + name[len("model.wpe."):]
    if name.startswith("model.norm."):
        return "model.decoder.final_layer_norm." + name[len("model.norm."):]
    if name.startswith("model.layers."):
        return "model.decoder.layers." + name[len("model.layers."):]
    return name


def _opt_state_dict(params, dtype) -> dict[str, np.ndarray]:
    state = _hf_state_dict(params, dtype)
    return {_opt_rename(name): arr for name, arr in state.items()}


def export_hf(path: str, params, cfg: ModelConfig, tokenizer=None,
              dtype=None) -> None:
    """Write an HF-ecosystem checkpoint directory: sharded bf16
    ``model.safetensors`` (+ index when >1 shard), ``config.json``, and
    tokenizer files when a tokenizer is provided.

    ``params`` may contain PackedLinear leaves (dequantized on the fly,
    mirroring the reference's fake-quant write-back) or plain dense
    trees (fp16-baseline export).
    """
    import ml_dtypes
    from safetensors.numpy import save_file

    if dtype is None:
        dtype = ml_dtypes.bfloat16
    os.makedirs(path, exist_ok=True)

    if cfg.family == "gpt2":
        state = _gpt2_state_dict(params, dtype)
        state.pop("lm_head.weight", None)  # tied to wte
    elif cfg.family == "opt":
        state = _opt_state_dict(params, dtype)
        state.pop("lm_head.weight", None)  # tied to embed_tokens
    else:
        state = _hf_state_dict(params, dtype)
        if cfg.tie_word_embeddings:
            state.pop("lm_head.weight", None)

    # shard by the HF ~4 GB convention
    shards: list[dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for name, arr in state.items():
        if sizes[-1] and sizes[-1] + arr.nbytes > _MAX_SHARD_BYTES:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = arr
        sizes[-1] += arr.nbytes

    if len(shards) == 1:
        save_file(shards[0], os.path.join(path, "model.safetensors"))
    else:
        weight_map = {}
        n = len(shards)
        for i, shard in enumerate(shards):
            fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            save_file(shard, os.path.join(path, fname))
            for name in shard:
                weight_map[name] = fname
        with open(os.path.join(path, "model.safetensors.index.json"),
                  "w") as f:
            json.dump({"metadata": {"total_size": sum(sizes)},
                       "weight_map": weight_map}, f, indent=2)

    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_config_dict(cfg), f, indent=2)

    if tokenizer is not None:
        tokenizer.save_pretrained(path)
    logger.info("[hf-export] wrote %d tensors (%d shard%s) to %s",
                len(state), len(shards), "s" if len(shards) > 1 else "",
                path)
