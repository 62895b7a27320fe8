"""Eval semantics tests: window schedule parity with the reference and
PPL sanity (a model that memorized the stream scores ~1)."""
import numpy as np
import jax
import jax.numpy as jnp

from tgq.eval import build_window_requests, perplexity_from_token_stream
from tgq.models import PRESETS, init_params


def reference_window_schedule(dataset_size, max_length, stride):
    """Transcribed independently from eval_utils.py:52-64 semantics."""
    out, prev_end = [], 0
    for begin in range(0, dataset_size, stride):
        end = min(begin + max_length, dataset_size)
        out.append((begin, end, end - prev_end))
        prev_end = end
        if end == dataset_size:
            break
    return out


def test_window_schedule_matches_reference():
    for n, w, s in [(10000, 2048, 512), (2047, 2048, 512), (2048, 2048, 512),
                    (2049, 2048, 512), (513, 2048, 512), (1, 64, 32),
                    (100, 64, 32)]:
        ours = [(r["begin"], r["end"], r["target_len"])
                for r in build_window_requests(n, w, s)]
        assert ours == reference_window_schedule(n, w, s), (n, w, s)


def test_window_targets_cover_stream_once():
    """Every token (past the first window's start) is scored exactly once."""
    n, w, s = 5000, 512, 128
    reqs = build_window_requests(n, w, s)
    covered = sum(r["target_len"] for r in reqs)
    assert covered == n


def test_ppl_uniform_model_equals_vocab():
    """A model with ~uniform logits must score PPL ≈ vocab size."""
    cfg = PRESETS["tiny-qwen3"]
    params = init_params(cfg, jax.random.key(0))
    # zero the lm path: tie_word_embeddings → zero embed gives zero logits
    # instead, scale final norm weight to ~0 so logits ≈ const
    params["model"]["norm"]["weight"] = jnp.zeros_like(
        params["model"]["norm"]["weight"])
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, 1000)
    ppl = perplexity_from_token_stream(params, cfg, ids, max_length=128,
                                       stride=64, attn_impl="naive")
    assert abs(ppl - cfg.vocab_size) / cfg.vocab_size < 0.02, ppl


def test_ppl_finite_and_positive():
    cfg = PRESETS["tiny-qwen3"]
    params = init_params(cfg, jax.random.key(1))
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, 700)
    ppl = perplexity_from_token_stream(params, cfg, ids, max_length=64,
                                       stride=32, attn_impl="naive")
    assert np.isfinite(ppl) and 1 < ppl
