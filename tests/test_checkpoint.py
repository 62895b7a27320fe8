"""Packed checkpoint save/load round-trip + serving restore."""
import numpy as np
import jax
import jax.numpy as jnp

from tgq.calib import QuantizeConfig, quantize_model, synthetic_calibration
from tgq.core.checkpoint import load_quantized, save_quantized
from tgq.core.packing import PackedLinear
from tgq.models import PRESETS, forward, init_params


def test_checkpoint_roundtrip(tmp_path):
    cfg = PRESETS["tiny-qwen3"]
    params = init_params(cfg, jax.random.key(0))
    calib = synthetic_calibration(cfg.vocab_size, 4, 32, seed=1)
    qcfg = QuantizeConfig(mode="pchol", w_bits=4, group_size=32, batch_size=2,
                          block_size=32, attn_impl="naive", eps=1e-8)
    params, packed, _ = quantize_model(params, cfg, calib, qcfg)

    path = str(tmp_path / "ckpt")
    save_quantized(path, params, packed, cfg, {"w_bits": 4})
    tree, cfg2, qmeta = load_quantized(path)
    assert cfg2 == cfg
    assert qmeta["w_bits"] == 4

    # every quantized linear restored as PackedLinear
    pl = tree["model"]["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(pl, PackedLinear)
    assert pl.bits == 4

    # packed checkpoint reproduces the fake-quant forward exactly
    ids = jnp.asarray(calib[:1, :16].astype(np.int32))
    ref = forward(params, cfg, ids, attn_impl="naive")
    out = forward(tree, cfg, ids, attn_impl="naive")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-2, atol=2e-2)


def test_checkpoint_size(tmp_path):
    import os

    cfg = PRESETS["tiny-qwen3"]
    params = init_params(cfg, jax.random.key(0))
    calib = synthetic_calibration(cfg.vocab_size, 2, 32, seed=1)
    qcfg = QuantizeConfig(mode="rtn", w_bits=4, group_size=32, batch_size=2,
                          attn_impl="naive")
    params, packed, _ = quantize_model(params, cfg, calib, qcfg)
    path = str(tmp_path / "ckpt")
    save_quantized(path, params, packed, cfg)
    sz = os.path.getsize(os.path.join(path, "weights.npz"))
    # decoder linears are ~0.6 MB fp32-equivalent; packed at 4b + embed bf16
    dense_bytes = sum(
        np.prod([64, 64]) for _ in range(0)
    )
    # the embed table dominates (512*64 bf16); just assert packing shrank
    # the layer weights: total < embed + 40% of dense layer size
    embed = cfg.vocab_size * cfg.hidden_size * 2
    layer_dense = (3 * 64 * 64 + 64 * 64 + 2 * 128 * 64 + 64 * 128) * 2 * 2
    assert sz < embed * 1.3 + layer_dense * 0.5


def test_checkpoint_bias_roundtrip(tmp_path):
    """PackedLinear biases (Qwen2-family) survive save/load."""
    cfg = PRESETS["tiny-qwen2"]
    params = init_params(cfg, jax.random.key(3))
    for lp in params["model"]["layers"]:
        for name in ("q_proj", "k_proj", "v_proj"):
            p = lp["self_attn"][name]
            p["b"] = jnp.full(p["b"].shape, 0.25, p["b"].dtype)
    calib = synthetic_calibration(cfg.vocab_size, 2, 32, seed=1)
    qcfg = QuantizeConfig(mode="rtn", w_bits=8, group_size=32, batch_size=2,
                          attn_impl="naive")
    params, packed, _ = quantize_model(params, cfg, calib, qcfg)
    assert any(p.bias is not None for p in packed.values())
    path = str(tmp_path / "ckpt")
    save_quantized(path, params, packed, cfg)
    tree, cfg2, _ = load_quantized(path)
    from tgq.core.packing import PackedLinear

    qkv = tree["model"]["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(qkv, PackedLinear) and qkv.bias is not None
    np.testing.assert_allclose(np.asarray(qkv.bias), 0.25, atol=1e-6)

    ids = jnp.asarray(calib[:1, :16].astype(np.int32))
    ref = forward(params, cfg, ids, attn_impl="naive")
    out = forward(tree, cfg2, ids, attn_impl="naive")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=2e-2, atol=2e-2)
