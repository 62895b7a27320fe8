"""Multi-chip calibration: DP-sharded batches + TP-sharded layers must
reproduce the single-device quantization (same codes up to fp reduction
order → compare dequantized weights and PPL)."""
import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgq.calib import QuantizeConfig, quantize_model, synthetic_calibration
from tgq.calib.data import synthetic_eval_stream
from tgq.eval import perplexity_from_token_stream
from tgq.models import PRESETS, init_params
from tgq.parallel import make_mesh

CFG = PRESETS["tiny-qwen3"]


def test_mesh_calibration_matches_single_device(eight_devices):
    mesh = make_mesh(data=4, devices=eight_devices)  # model axis 2
    params = init_params(CFG, jax.random.key(0))
    calib = synthetic_calibration(CFG.vocab_size, n_samples=8, seq_len=64, seed=2)
    qcfg = QuantizeConfig(mode="pchol", w_bits=4, group_size=32, batch_size=4,
                          block_size=32, attn_impl="naive", eps=1e-8)

    p1, _, _ = quantize_model(copy.deepcopy(params), CFG, calib, qcfg)
    p2, _, _ = quantize_model(copy.deepcopy(params), CFG, calib, qcfg,
                              mesh=mesh)

    w1 = np.asarray(p1["model"]["layers"][0]["self_attn"]["q_proj"]["w"],
                    np.float32)
    w2 = np.asarray(p2["model"]["layers"][0]["self_attn"]["q_proj"]["w"],
                    np.float32)
    # identical up to a tiny fraction of boundary-rounding flips
    assert (np.abs(w1 - w2) > 1e-6).mean() < 0.02

    eval_ids = synthetic_eval_stream(CFG.vocab_size, 1024, seed=3)
    ppl1 = perplexity_from_token_stream(p1, CFG, eval_ids, max_length=64,
                                        stride=32, attn_impl="naive")
    ppl2 = perplexity_from_token_stream(p2, CFG, eval_ids, max_length=64,
                                        stride=32, attn_impl="naive")
    assert abs(ppl1 - ppl2) / ppl1 < 0.02, (ppl1, ppl2)
