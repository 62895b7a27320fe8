"""Hermetic trained-tiny-model harness for quantization-quality trends.

A RANDOM-INIT model has flat logits: its PPL sits at the uniform bound
and every quantizer's delta is measurement noise (measured: RTN can
"improve" PPL).  The published low-bit quality trend (reference
README.md:29-41) is only observable on a model with structure — so this
module trains a tiny Qwen3-architecture model on a synthetic Markov
token source for a few hundred Adam steps on CPU (seconds), giving a
hermetic model whose PPL is far below uniform and whose quantization
deltas are real signal.  Used by tgq.cli.tiny_quality_bench (RESULTS.md
low-bit trend table) and the ordering tests in tests/test_pipeline_e2e.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tgq.models import init_params
from tgq.models.causal_lm import forward
from tgq.models.config import ModelConfig


def markov_source(vocab_size: int, branching: int = 4, seed: int = 0):
    """A low-entropy bigram language: each token has ``branching``
    likely successors (Zipf-weighted), the rest share 2% probability
    mass.  Entropy ≈ log(branching) « log(vocab) — a trained model's
    PPL separates cleanly from the uniform bound."""
    rng = np.random.default_rng(seed)
    succ = np.stack([rng.choice(vocab_size, size=branching, replace=False)
                     for _ in range(vocab_size)])
    w = 1.0 / np.arange(1, branching + 1)
    p_main = 0.98 * w / w.sum()
    probs = np.full((vocab_size, vocab_size), 0.02 / vocab_size)
    np.put_along_axis(probs, succ, p_main[None, :]
                      + np.take_along_axis(probs, succ, 1), axis=1)
    probs /= probs.sum(axis=1, keepdims=True)
    return probs


def sample_stream(probs: np.ndarray, n_tokens: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    v = probs.shape[0]
    out = np.empty((n_tokens,), np.int32)
    tok = int(rng.integers(v))
    cum = probs.cumsum(axis=1)
    u = rng.random(n_tokens)
    for i in range(n_tokens):
        tok = int(np.searchsorted(cum[tok], u[i]))
        out[i] = min(tok, v - 1)
    return out


def train_tiny(cfg: ModelConfig, steps: int = 300, batch: int = 32,
               seq_len: int = 64, lr: float = 3e-3, seed: int = 0,
               source_seed: int = 0, outlier_channels: int = 0,
               outlier_scale: float = 30.0):
    """Train ``cfg`` from scratch on the Markov source; returns
    (params, probs) with params in bf16 (the calibration dtype).

    ``outlier_channels`` > 0 scales that many embedding channels by
    ``outlier_scale`` at init, inducing the massive-activation /
    channel-outlier structure of real LLM hidden states (diag(H)
    spanning decades — the property a briefly-trained tiny model lacks:
    measured max/median diag ≈ 1.4 vs 1e3+ on real models).  The model
    trains WITH the outliers, so its function genuinely uses them —
    calibration Hessians then have the trace-dominating channel
    structure that separates TruncGPTQ from damped GPTQ
    (tgq.cli.trunc_regimes 'channel' spectrum)."""
    import optax

    probs = markov_source(cfg.vocab_size, seed=source_seed)
    stream = sample_stream(probs, steps * batch * seq_len + seq_len,
                           seed=seed + 1)
    params = init_params(cfg, jax.random.key(seed))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    if outlier_channels:
        emb = params["model"]["embed_tokens"]["weight"]
        scale = jnp.ones((1, emb.shape[1]), emb.dtype).at[
            :, :outlier_channels].set(outlier_scale)
        params["model"]["embed_tokens"]["weight"] = emb * scale
    opt = optax.adamw(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, ids):
        def loss_fn(p):
            logits = forward(p, cfg, ids[:, :-1], attn_impl="naive")
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = ids[:, 1:]
            return -jnp.mean(
                jnp.take_along_axis(logp, tgt[..., None], axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = batch * seq_len
    loss = None
    for i in range(steps):
        chunk = stream[i * n: i * n + n + 1]
        ids = np.stack([chunk[j * seq_len: j * seq_len + seq_len + 1]
                        for j in range(batch)])
        params, opt_state, loss = step(params, opt_state, jnp.asarray(ids))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    return params, probs, float(loss)
