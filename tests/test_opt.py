"""OPT family (model.decoder.layers layout): forward, staged-pipeline
equality, end-to-end quantization, HF import/export roundtrip.

The reference adapts this family via its second get_layers branch
(reference model_utils.py:60-63); tgq implements it first-party
(tgq.models.opt) with the same 4-group staged calibration protocol.
"""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgq.models import PRESETS, forward, init_params

CFG = PRESETS["tiny-opt"]


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.key(0))


def test_forward_finite(params):
    ids = jnp.asarray([[1, 5, 9, 200, 3, 77]])
    logits = forward(params, CFG, ids, attn_impl="naive")
    assert logits.shape == (1, 6, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_position_embeddings_matter(params):
    """Same token at different positions must differ (wpe applied with
    the +2 offset)."""
    ids = jnp.asarray([[7, 7, 7, 7]])
    logits = np.asarray(forward(params, CFG, ids, attn_impl="naive"))
    assert not np.allclose(logits[0, 0], logits[0, 3], atol=1e-3)


def test_staged_pipeline_matches_layer_forward(params):
    """The calibration stage chain (group inputs + staged output) must
    reproduce the monolithic decoder layer on the opt family."""
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
    for gi, d in enumerate([CFG.hidden_size, CFG.hidden_size,
                            CFG.hidden_size, CFG.intermediate_size]):
        a = _group_input(lp, CFG, gi, x, cos, sin, attn_impl="naive")
        assert a.shape[-1] == d, (gi, a.shape)


def test_cli_quantize_opt_e2e(tmp_path):
    """Full CLI run on tiny-opt: 4 groups x 2 layers quantized, packed
    checkpoint written, finite PPL."""
    from tgq.cli.quantize import main

    out = str(tmp_path / "opt_out")
    rc = main(["--model_id", "tiny-opt", "--dataset", "synthetic",
               "--n_samples", "4", "--seq_len", "64", "--batch_size", "2",
               "--group_size", "-1", "--block_size", "32",
               "--attn_impl", "naive", "--mode", "pchol", "--w_bits", "4",
               "--eps", "1e-7", "--save_path", out])
    assert rc == 0
    res = json.load(open(os.path.join(out, "results.json")))
    assert np.isfinite(res["metrics"]["quantized_ppl"])
    names = [s["name"] for s in res["layer_stats"]]
    assert "layer_0.self_attn.q_proj" in names
    assert "layer_1.fc2" in names
    assert len(names) == 2 * 6  # q,k,v,out_proj,fc1,fc2 per layer
    assert os.path.exists(os.path.join(out, "weights.npz"))


def test_hf_import_opt_layout(tmp_path):
    """HF-style OPT checkpoint (model.decoder.* names, nn.Linear
    weights, tied lm_head) imports to a tree whose forward matches the
    source params."""
    from safetensors.numpy import save_file

    from tgq.models.hf_import import load_hf_checkpoint

    params = init_params(CFG, jax.random.key(4))
    tensors = {}
    m = params["model"]
    d = "model.decoder."
    tensors[d + "embed_tokens.weight"] = np.asarray(m["embed_tokens"]["weight"])
    tensors[d + "embed_positions.weight"] = np.asarray(m["wpe"]["weight"])
    tensors[d + "final_layer_norm.weight"] = np.asarray(m["norm"]["weight"])
    tensors[d + "final_layer_norm.bias"] = np.asarray(m["norm"]["bias"])
    tensors["lm_head.weight"] = np.asarray(m["embed_tokens"]["weight"])
    for i, lp in enumerate(m["layers"]):
        p = f"{d}layers.{i}."
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            tensors[p + ln + ".weight"] = np.asarray(lp[ln]["weight"])
            tensors[p + ln + ".bias"] = np.asarray(lp[ln]["bias"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            e = lp["self_attn"][proj]
            tensors[p + "self_attn." + proj + ".weight"] = np.asarray(e["w"])
            tensors[p + "self_attn." + proj + ".bias"] = np.asarray(e["b"])
        for fc in ("fc1", "fc2"):
            tensors[p + fc + ".weight"] = np.asarray(lp[fc]["w"])
            tensors[p + fc + ".bias"] = np.asarray(lp[fc]["b"])
    ckpt = tmp_path / "opt_ckpt"
    os.makedirs(ckpt)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              str(ckpt / "model.safetensors"))
    hf_cfg = {
        "model_type": "opt", "vocab_size": CFG.vocab_size,
        "hidden_size": CFG.hidden_size, "ffn_dim": CFG.intermediate_size,
        "num_hidden_layers": CFG.num_layers,
        "num_attention_heads": CFG.num_heads,
        "max_position_embeddings": CFG.max_position_embeddings,
        "word_embed_proj_dim": CFG.hidden_size,
        "do_layer_norm_before": True, "tie_word_embeddings": True,
    }
    json.dump(hf_cfg, open(ckpt / "config.json", "w"))

    got_params, got_cfg = load_hf_checkpoint(str(ckpt))
    assert got_cfg.family == "opt"
    assert got_cfg.intermediate_size == CFG.intermediate_size
    ids = jnp.asarray([[1, 5, 9, 200, 3]])
    want = np.asarray(forward(params, CFG, ids, attn_impl="naive"))
    got = np.asarray(forward(got_params, got_cfg, ids, attn_impl="naive"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_opt_rejects_350m_style_config(tmp_path):
    from tgq.models.hf_import import config_from_hf

    base = {"model_type": "opt", "vocab_size": 50272, "hidden_size": 1024,
            "ffn_dim": 4096, "num_hidden_layers": 24,
            "num_attention_heads": 16, "max_position_embeddings": 2048}
    with pytest.raises(ValueError, match="word_embed_proj_dim"):
        config_from_hf({**base, "word_embed_proj_dim": 512})
    with pytest.raises(ValueError, match="post-norm"):
        config_from_hf({**base, "do_layer_norm_before": False})


@pytest.mark.parametrize("preset", ["tiny-opt", "tiny-gpt2"])
def test_hf_export_import_roundtrip(tmp_path, preset):
    """export_hf → load_hf_checkpoint roundtrips both learned-position
    families bit-compatibly (gpt2: Conv1D re-transpose is the exact
    inverse of the import transpose; opt: pure renames)."""
    from tgq.models.hf_export import export_hf
    from tgq.models.hf_import import load_hf_checkpoint

    cfg = PRESETS[preset]
    params = init_params(cfg, jax.random.key(6))
    out = str(tmp_path / f"{preset}_export")
    export_hf(out, params, cfg)
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    hf_cfg = json.load(open(os.path.join(out, "config.json")))
    assert hf_cfg["model_type"] == cfg.family

    got_params, got_cfg = load_hf_checkpoint(out)
    assert got_cfg.family == cfg.family
    assert got_cfg.num_layers == cfg.num_layers
    ids = jnp.asarray([[1, 5, 9, 200, 3, 44]])
    want = np.asarray(forward(params, cfg, ids, attn_impl="naive"))
    got = np.asarray(forward(got_params, got_cfg, ids, attn_impl="naive"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_serving_rejects_opt(params):
    from tgq.serve import Engine, ServeConfig

    with pytest.raises(AssertionError, match="rope/GQA"):
        Engine(params, CFG, ServeConfig(max_slots=1))


def test_opt_greedy_generate_end_to_end():
    """The documented non-llama generation path (README §Supported
    architectures): quantize a tiny OPT model, then generate greedily
    through the family-agnostic full-recompute path — serving the
    boundary the paged-KV engine intentionally does not cover."""
    import numpy as np

    from tgq.calib import QuantizeConfig, quantize_model, \
        synthetic_calibration
    from tgq.models.causal_lm import greedy_generate

    cfg = PRESETS["tiny-opt"]
    params = init_params(cfg, jax.random.key(0))
    calib = synthetic_calibration(cfg.vocab_size, n_samples=4, seq_len=32,
                                  seed=0)
    qcfg = QuantizeConfig(mode="pchol", w_bits=8, group_size=32,
                          batch_size=2, block_size=32, attn_impl="naive",
                          eps=1e-6)
    qparams, _, _ = quantize_model(params, cfg, calib, qcfg)

    prompt = [5, 17, 42, 7]
    out = greedy_generate(qparams, cfg, prompt, 6, attn_impl="naive")
    assert len(out) == 6
    assert all(0 <= t < cfg.vocab_size for t in out)
    # greedy == manual argmax loop over full forwards (oracle)
    from tgq.models.causal_lm import forward

    seq = list(prompt)
    for _ in range(6):
        logits = forward(qparams, cfg, jnp.asarray([seq]),
                         attn_impl="naive")
        seq.append(int(np.argmax(np.asarray(logits[0, -1]))))
    assert out == seq[len(prompt):]
