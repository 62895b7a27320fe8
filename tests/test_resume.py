"""Per-layer checkpoint/resume of the quantization sweep."""
import copy

import numpy as np
import jax
import jax.numpy as jnp

from tgq.calib import QuantizeConfig, quantize_model, synthetic_calibration
from tgq.models import PRESETS, init_params

CFG = PRESETS["tiny-qwen3"]


def test_resume_matches_uninterrupted(tmp_path):
    params0 = init_params(CFG, jax.random.key(0))
    calib = synthetic_calibration(CFG.vocab_size, 4, 32, seed=5)
    qcfg = QuantizeConfig(mode="pchol", w_bits=4, group_size=32, batch_size=2,
                          block_size=32, attn_impl="naive", eps=1e-8)

    # uninterrupted run
    p_full, packed_full, log_full = quantize_model(
        copy.deepcopy(params0), CFG, calib, qcfg)

    # interrupted after layer 0, then resumed
    rdir = str(tmp_path / "resume")
    p1, _, _ = quantize_model(copy.deepcopy(params0), CFG, calib, qcfg,
                              resume_dir=rdir, stop_after_layer=0)
    p2, packed2, log2 = quantize_model(copy.deepcopy(params0), CFG, calib,
                                       qcfg, resume_dir=rdir)

    for li in range(CFG.num_layers):
        w_full = np.asarray(
            p_full["model"]["layers"][li]["self_attn"]["q_proj"]["w"],
            np.float32)
        w_res = np.asarray(
            p2["model"]["layers"][li]["self_attn"]["q_proj"]["w"], np.float32)
        np.testing.assert_allclose(w_res, w_full, rtol=1e-5, atol=1e-6)

    assert set(packed2) == set(packed_full)
    pl_a = packed2["layers.1.mlp.down_proj"]
    pl_b = packed_full["layers.1.mlp.down_proj"]
    np.testing.assert_array_equal(np.asarray(pl_a.codes), np.asarray(pl_b.codes))
    # layer_stats cover all layers exactly once
    names = [s["name"] for s in log2["layer_stats"]]
    assert len(names) == len(set(names)) == CFG.num_layers * 7
