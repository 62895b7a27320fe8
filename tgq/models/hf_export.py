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
    flags: qk_norm ⇒ qwen3, attention_bias ⇒ qwen2, else llama."""
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

    if cfg.family == "gpt2":
        raise NotImplementedError(
            "HF export of the gpt2 family (Conv1D re-transpose + "
            "transformer.h renames) is not implemented; use the packed "
            "checkpoint (tgq.core.checkpoint)")
    if dtype is None:
        dtype = ml_dtypes.bfloat16
    os.makedirs(path, exist_ok=True)

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
