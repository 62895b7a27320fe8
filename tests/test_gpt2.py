"""GPT-2 family (transformer.h layout): forward, staged-pipeline
equality, end-to-end quantization, HF import with Conv1D transposes."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgq.models import PRESETS, forward, init_params

CFG = PRESETS["tiny-gpt2"]


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.key(0))


def test_forward_finite(params):
    ids = jnp.asarray([[1, 5, 9, 200, 3, 77]])
    logits = forward(params, CFG, ids, attn_impl="naive")
    assert logits.shape == (1, 6, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_position_embeddings_matter(params):
    """Same token at different positions must produce different logits
    (wpe actually applied — the llama path has no such term)."""
    ids = jnp.asarray([[7, 7, 7, 7]])
    logits = np.asarray(forward(params, CFG, ids, attn_impl="naive"))
    assert not np.allclose(logits[0, 0], logits[0, 3], atol=1e-3)


def test_staged_pipeline_matches_layer_forward(params):
    """The calibration stage chain (group inputs + staged output) must
    reproduce the monolithic decoder layer on the gpt2 family."""
    from tgq.calib.pipeline import (_group_input, _stage_attn, _stage_out,
                                    _stage_resid)
    from tgq.models.causal_lm import decoder_layer, rope_cache

    lp = params["model"]["layers"][0]
    x = jax.random.normal(jax.random.key(3), (2, 16, CFG.hidden_size),
                          jnp.float32).astype(jnp.bfloat16)
    cos, sin = rope_cache(CFG, 16)
    want = decoder_layer(lp, CFG, x, cos, sin, attn_impl="naive")
    attn = _stage_attn(lp, CFG, x, cos, sin, attn_impl="naive")
    got = _stage_out(lp, CFG, _stage_resid(lp, CFG, x, attn))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    # group inputs have the right shapes for the Hessian accumulators
    for gi, d in enumerate([CFG.hidden_size, CFG.hidden_size,
                            CFG.hidden_size, CFG.intermediate_size]):
        a = _group_input(lp, CFG, gi, x, cos, sin, attn_impl="naive")
        assert a.shape[-1] == d, (gi, a.shape)


def test_cli_quantize_gpt2_e2e(tmp_path):
    """Full CLI run on tiny-gpt2: 4 groups x 2 layers quantized, packed
    checkpoint written, finite PPL."""
    from tgq.cli.quantize import main

    out = str(tmp_path / "gpt2_out")
    rc = main(["--model_id", "tiny-gpt2", "--dataset", "synthetic",
               "--n_samples", "4", "--seq_len", "64", "--batch_size", "2",
               "--group_size", "-1", "--block_size", "32",
               "--attn_impl", "naive", "--mode", "pchol", "--w_bits", "4",
               "--eps", "1e-7", "--save_path", out])
    assert rc == 0
    res = json.load(open(os.path.join(out, "results.json")))
    assert np.isfinite(res["metrics"]["quantized_ppl"])
    names = [s["name"] for s in res["layer_stats"]]
    assert "layer_0.attn.c_attn" in names
    assert "layer_1.mlp.c_proj" in names
    assert len(names) == 2 * 4
    assert os.path.exists(os.path.join(out, "weights.npz"))


def test_quantized_close_to_dense(params):
    """4-bit TruncGPTQ on tiny-gpt2 keeps logits close to dense."""
    from tgq.calib.data import get_loaders
    from tgq.calib.pipeline import QuantizeConfig, quantize_model

    ids = get_loaders("synthetic", None, 4, 64, seed=42,
                      vocab_size=CFG.vocab_size)
    qcfg = QuantizeConfig(mode="pchol", w_bits=4, group_size=-1,
                          batch_size=2, eps=1e-7, attn_impl="naive")
    import copy

    qparams, packed, _ = quantize_model(copy.deepcopy(params), CFG, ids, qcfg)
    assert len(packed) == CFG.num_layers * 4
    toks = jnp.asarray([[1, 5, 9, 200, 3]])
    ref = np.asarray(forward(params, CFG, toks, attn_impl="naive"))
    got = np.asarray(forward(qparams, CFG, toks, attn_impl="naive"))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # tiny random models: same procedure yields ~0.25 on tiny-qwen3
    assert rel < 0.3, rel


def test_hf_import_gpt2_conv1d(tmp_path):
    """HF-style GPT-2 checkpoint (transformer.h names, Conv1D (in,out)
    weights, mask buffers) imports to a tree whose forward matches the
    source params."""
    from safetensors.numpy import save_file

    from tgq.models.hf_import import load_hf_checkpoint

    params = init_params(CFG, jax.random.key(4))
    tensors = {}
    m = params["model"]
    tensors["transformer.wte.weight"] = np.asarray(m["embed_tokens"]["weight"])
    tensors["transformer.wpe.weight"] = np.asarray(m["wpe"]["weight"])
    tensors["transformer.ln_f.weight"] = np.asarray(m["norm"]["weight"])
    tensors["transformer.ln_f.bias"] = np.asarray(m["norm"]["bias"])
    for i, lp in enumerate(m["layers"]):
        p = f"transformer.h.{i}."
        for ln in ("ln_1", "ln_2"):
            tensors[p + ln + ".weight"] = np.asarray(lp[ln]["weight"])
            tensors[p + ln + ".bias"] = np.asarray(lp[ln]["bias"])
        for mod, sub in (("attn", "c_attn"), ("attn", "c_proj"),
                         ("mlp", "c_fc"), ("mlp", "c_proj")):
            ent = lp[mod][sub]
            # HF Conv1D convention: (in, out)
            tensors[f"{p}{mod}.{sub}.weight"] = np.ascontiguousarray(
                np.asarray(ent["w"]).T)
            tensors[f"{p}{mod}.{sub}.bias"] = np.asarray(ent["b"])
        # causal-mask buffer that must be skipped
        tensors[p + "attn.bias"] = np.ones((1, 1, 4, 4), np.float32)
    path = str(tmp_path / "gpt2_hf")
    os.makedirs(path)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    hf_cfg = {"model_type": "gpt2", "vocab_size": CFG.vocab_size,
              "n_embd": CFG.hidden_size, "n_layer": CFG.num_layers,
              "n_head": CFG.num_heads, "n_inner": CFG.intermediate_size,
              "n_positions": CFG.max_position_embeddings,
              "layer_norm_epsilon": CFG.rms_norm_eps}
    json.dump(hf_cfg, open(os.path.join(path, "config.json"), "w"))

    params2, cfg2 = load_hf_checkpoint(path)
    assert cfg2.family == "gpt2"
    assert cfg2.intermediate_size == CFG.intermediate_size
    ids = jnp.asarray([[1, 5, 9, 200, 3]])
    ref = np.asarray(forward(params, CFG, ids, attn_impl="naive"))
    got = np.asarray(forward(params2, cfg2, ids, attn_impl="naive"))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_serving_rejects_gpt2(params):
    from tgq.serve import Engine, ServeConfig

    with pytest.raises(AssertionError):
        Engine(params, CFG, ServeConfig())
