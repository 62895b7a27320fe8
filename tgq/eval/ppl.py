"""Strided sliding-window perplexity (reference eval_utils.py:17-108).

Window schedule, target masking, right-padding, and token-weighted NLL
accumulation reproduce the reference exactly — the PPL deltas being
measured (e.g. +0.08 at W4) are smaller than what an off-by-one in stride
handling would introduce (SURVEY.md §7 "hard parts").

The forward runs as one jitted step per padded batch (static shapes:
window × batch fixed); NLL reduction happens on-device, only two scalars
cross back per batch.  Causal attention makes the right-padding mask
unnecessary: padded positions sit strictly after every scored position,
so they cannot influence any scored logit, and their own labels are -100.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tgq.models.causal_lm import forward
from tgq.models.config import ModelConfig

logger = logging.getLogger(__name__)

IGNORE = -100


def build_window_requests(dataset_size: int, max_length: int, stride: int):
    """Reference eval_utils.py:52-64 — verbatim schedule semantics."""
    requests = []
    prev_end_loc = 0
    for begin_loc in range(0, dataset_size, stride):
        end_loc = min(begin_loc + max_length, dataset_size)
        target_len = end_loc - prev_end_loc
        requests.append({"begin": begin_loc, "end": end_loc, "target_len": target_len})
        prev_end_loc = end_loc
        if end_loc == dataset_size:
            break
    return requests


@partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _batch_nll(params, cfg: ModelConfig, input_ids, labels, attn_impl="auto"):
    """Summed token NLL + active-token count for one padded batch.

    Causal-LM shift: logits at position t score labels[t+1]
    (HF outputs.loss semantics the reference relies on).
    """
    logits = forward(params, cfg, input_ids, attn_impl=attn_impl)
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = shift_labels != IGNORE
    safe_labels = jnp.where(mask, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    tok_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    nll = -jnp.sum(jnp.where(mask, tok_ll, 0.0))
    return nll, jnp.sum(mask)


def perplexity_from_token_stream(
    params,
    cfg: ModelConfig,
    token_ids: np.ndarray,
    max_length: int | None = None,
    stride: int = 512,
    batch_size: int = 4,
    pad_token_id: int = 0,
    attn_impl: str = "auto",
) -> float:
    """PPL of a flat token stream with the reference's window schedule."""
    token_ids = np.asarray(token_ids).reshape(-1)
    if max_length is None:
        max_length = cfg.seqlen
    n = len(token_ids)
    requests = build_window_requests(n, max_length, stride)
    logger.info("[eval] tokens=%d window=%d stride=%d windows=%d",
                n, max_length, stride, len(requests))

    total_nll = 0.0
    total_tokens = 0
    n_batches = -(-len(requests) // batch_size)
    # running-PPL liveness, reference eval_utils.py:70,101-103: report
    # every ~10% of batches (and the first, where compile time lands)
    report_every = max(1, n_batches // 10)
    for i in range(0, len(requests), batch_size):
        batch = requests[i : i + batch_size]
        inp = np.full((batch_size, max_length), pad_token_id, np.int32)
        lab = np.full((batch_size, max_length), IGNORE, np.int32)
        for j, req in enumerate(batch):
            ids = token_ids[req["begin"] : req["end"]]
            L = len(ids)
            inp[j, :L] = ids
            lab[j, :L] = ids
            lab[j, : L - req["target_len"]] = IGNORE  # score only the tail
        nll, count = _batch_nll(params, cfg, jnp.asarray(inp), jnp.asarray(lab),
                                attn_impl=attn_impl)
        total_nll += float(nll)
        total_tokens += int(count)
        b = i // batch_size + 1
        if total_tokens and (b % report_every == 0 or b == n_batches):
            logger.info("[eval] batch %d/%d running PPL: %.4f",
                        b, n_batches, float(np.exp(total_nll / total_tokens)))
    if total_tokens == 0:
        return float("inf")
    return float(np.exp(total_nll / total_tokens))


def evaluate_perplexity(
    params,
    cfg: ModelConfig,
    dataset: str = "wikitext2",
    tokenizer=None,
    stride: int = 512,
    batch_size: int = 4,
    attn_impl: str = "auto",
    token_ids: np.ndarray | None = None,
) -> float:
    """Dataset-level entry point (reference evaluate_perplexity).

    Either pass a pre-tokenized ``token_ids`` stream (hermetic/synthetic
    runs) or a dataset name + tokenizer (requires local HF caches).
    """
    if token_ids is None:
        from tgq.calib.data import load_eval_tokens

        token_ids = load_eval_tokens(dataset, tokenizer)
    pad = 0
    if tokenizer is not None:
        pad = tokenizer.pad_token_id or tokenizer.eos_token_id or 0
    return perplexity_from_token_stream(
        params, cfg, token_ids, stride=stride, batch_size=batch_size,
        pad_token_id=pad, attn_impl=attn_impl,
    )
