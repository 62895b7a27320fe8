"""HF checkpoint import: write a real safetensors checkpoint in HF
layout from our params, re-import, and compare forwards."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

from tgq.models import PRESETS, forward, init_params
from tgq.models.hf_import import config_from_hf, load_hf_checkpoint

CFG = PRESETS["tiny-qwen3"]


def export_hf_style(params, cfg, path):
    """Emit model.safetensors + config.json the way HF checkpoints look."""
    from safetensors.numpy import save_file

    tensors = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if isinstance(v, dict):
                walk(v, name)
            elif isinstance(v, list):
                for i, lp in enumerate(v):
                    walk(lp, f"{name}.{i}")
            else:
                arr = np.asarray(v)
                leaf = name
                if leaf.endswith(".w"):
                    leaf = leaf[:-2] + ".weight"
                elif leaf.endswith(".b"):
                    leaf = leaf[:-2] + ".bias"
                tensors[leaf] = arr
        return tensors

    walk(params, "")
    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    hf_cfg = {
        "model_type": "qwen3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "max_position_embeddings": cfg.max_position_embeddings,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f)


def test_config_mapping():
    hf = {"model_type": "qwen3", "vocab_size": 100, "hidden_size": 64,
          "intermediate_size": 128, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "head_dim": 16, "rope_theta": 1e4, "tie_word_embeddings": True}
    cfg = config_from_hf(hf)
    assert cfg.qk_norm is True
    assert cfg.num_kv_heads == 2
    hf["model_type"] = "llama"
    assert config_from_hf(hf).qk_norm is False


def test_roundtrip_forward(tmp_path):
    params = init_params(CFG, jax.random.key(0))
    path = str(tmp_path / "hf_ckpt")
    export_hf_style(params, CFG, path)

    params2, cfg2 = load_hf_checkpoint(path)
    assert cfg2.hidden_size == CFG.hidden_size
    assert cfg2.num_layers == CFG.num_layers
    assert cfg2.qk_norm

    ids = jnp.asarray([[1, 5, 9, 200, 3]])
    ref = forward(params, CFG, ids, attn_impl="naive")
    out = forward(params2, cfg2, ids, attn_impl="naive")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-3, atol=1e-3)


def test_hf_export_quantized_roundtrip(tmp_path):
    """export_hf writes a dequantized-bf16 HF checkpoint from a
    quantized (fake-quant) tree that load_hf_checkpoint re-imports with
    matching logits (reference quantize.py:262-275 parity)."""
    from tgq.calib.data import get_loaders
    from tgq.calib.pipeline import QuantizeConfig, quantize_model
    from tgq.models.hf_export import export_hf

    params = init_params(CFG, jax.random.key(0))
    ids = get_loaders("synthetic", None, 4, 64, seed=42,
                      vocab_size=CFG.vocab_size)
    qcfg = QuantizeConfig(mode="pchol", w_bits=4, group_size=-1,
                          batch_size=2, eps=1e-7, attn_impl="naive")
    params, packed, _ = quantize_model(params, CFG, ids, qcfg)

    path = str(tmp_path / "hf_export")
    export_hf(path, params, CFG, tokenizer=None)
    assert os.path.exists(os.path.join(path, "model.safetensors"))
    hf_cfg = json.load(open(os.path.join(path, "config.json")))
    assert hf_cfg["model_type"] == "qwen3"
    assert hf_cfg["num_hidden_layers"] == CFG.num_layers

    params2, cfg2 = load_hf_checkpoint(path)
    toks = jnp.asarray([[1, 5, 9, 200, 3]])
    ref = forward(params, CFG, toks, attn_impl="naive")
    out = forward(params2, cfg2, toks, attn_impl="naive")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-3, atol=1e-3)


def test_hf_export_packed_dequant(tmp_path):
    """PackedLinear leaves export as dequantized dense weights (bias
    preserved) — a packed serving tree is exportable directly."""
    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
    from tgq.models.hf_export import export_hf
    from tgq.models.causal_lm import get_nested, set_nested

    cfg = PRESETS["tiny-qwen2"]  # qkv biases
    params = init_params(cfg, jax.random.key(1))
    spec = QuantSpec(bits=4, group_size=-1, sym=False)
    lp = params["model"]["layers"][0]
    entry = get_nested(lp, "self_attn.q_proj")
    w = entry["w"].astype(jnp.float32)
    p = find_params(w, spec)
    s, z = expand_params(p, w.shape[1])
    q = quantize(w, s, z, spec).astype(jnp.int32)
    pl = PackedLinear.from_codes(q, p.scale, p.zero, spec,
                                 bias=entry.get("b"))
    set_nested(lp, "self_attn.q_proj", pl)

    path = str(tmp_path / "hf_packed")
    export_hf(path, params, cfg, tokenizer=None)
    params2, cfg2 = load_hf_checkpoint(path)
    w2 = np.asarray(params2["model"]["layers"][0]["self_attn"]["q_proj"]["w"],
                    dtype=np.float32)
    np.testing.assert_allclose(w2, np.asarray(pl.dequantize(), np.float32),
                               rtol=2e-2, atol=2e-2)  # bf16 storage
    assert "b" in params2["model"]["layers"][0]["self_attn"]["q_proj"]
