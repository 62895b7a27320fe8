"""Model definition tests: shapes, causality, GQA, quantized-linear swap."""
import numpy as np
import jax
import jax.numpy as jnp

from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
from tgq.core.packing import PackedLinear
from tgq.models import PRESETS, forward, init_params, rope_cache
from tgq.models.causal_lm import (
    apply_linear,
    decoder_layer,
    embed_tokens,
    get_nested,
    sequenced_groups,
    set_nested,
)

CFG = PRESETS["tiny-qwen3"]
CFG_L = PRESETS["tiny-llama"]


def test_forward_shapes():
    params = init_params(CFG, jax.random.key(0))
    ids = jnp.zeros((2, 16), jnp.int32)
    logits = forward(params, CFG, ids, attn_impl="naive")
    assert logits.shape == (2, 16, CFG.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())


def test_llama_variant_no_qknorm():
    params = init_params(CFG_L, jax.random.key(1))
    assert "q_norm" not in params["model"]["layers"][0]["self_attn"]
    ids = jnp.zeros((1, 8), jnp.int32)
    logits = forward(params, CFG_L, ids, attn_impl="naive")
    assert logits.shape == (1, 8, CFG_L.vocab_size)


def test_causality():
    """Changing token t must not affect logits at positions < t."""
    params = init_params(CFG, jax.random.key(2))
    ids = jax.random.randint(jax.random.key(3), (1, 12), 0, CFG.vocab_size)
    ids2 = ids.at[0, 6].set((ids[0, 6] + 1) % CFG.vocab_size)
    l1 = forward(params, CFG, ids, attn_impl="naive")
    l2 = forward(params, CFG, ids2, attn_impl="naive")
    np.testing.assert_allclose(
        np.asarray(l1[0, :6]), np.asarray(l2[0, :6]), rtol=1e-4, atol=1e-4
    )
    assert np.abs(np.asarray(l1[0, 6:]) - np.asarray(l2[0, 6:])).max() > 1e-3


def test_gqa_repeat_matches_mha_when_equal_heads():
    from tgq.models.causal_lm import _naive_causal_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 8, 4, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    out = _naive_causal_attention(q, k, v)
    # manual: heads 0,1 use kv 0; heads 2,3 use kv 1
    out_expected = _naive_causal_attention(
        q, jnp.repeat(k, 2, axis=2), jnp.repeat(v, 2, axis=2)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_expected), rtol=1e-6)


def test_packed_linear_swap_close_to_dense():
    """Replacing a dense linear with its 8-bit PackedLinear barely moves
    the layer output (the quantized-forward plumbing)."""
    params = init_params(CFG, jax.random.key(4), dtype=jnp.float32)
    lp = params["model"]["layers"][0]
    x = jax.random.normal(jax.random.key(5), (1, 16, CFG.hidden_size), jnp.float32) * 0.1
    cos, sin = rope_cache(CFG, 16)
    y_ref = decoder_layer(lp, CFG, x, cos, sin, attn_impl="naive")

    spec = QuantSpec(bits=8, group_size=-1, sym=False)
    for name in ["self_attn.q_proj", "mlp.down_proj"]:
        w = get_nested(lp, name)["w"]
        p = find_params(w, spec)
        s, z = expand_params(p, w.shape[1])
        q = quantize(w, s, z, spec).astype(jnp.int32)
        set_nested(lp, name, PackedLinear.from_codes(q, p.scale, p.zero, spec))
    y_q = decoder_layer(lp, CFG, x, cos, sin, attn_impl="naive")
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.01, rel


def test_sequenced_groups_structure():
    groups = sequenced_groups(CFG)
    assert groups == [
        ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
        ["self_attn.o_proj"],
        ["mlp.gate_proj", "mlp.up_proj"],
        ["mlp.down_proj"],
    ]


def test_apply_linear_bias():
    p = {"w": jnp.ones((3, 2), jnp.float32), "b": jnp.asarray([1.0, 2.0, 3.0])}
    y = apply_linear(p, jnp.ones((1, 2), jnp.float32))
    np.testing.assert_allclose(np.asarray(y), [[3.0, 4.0, 5.0]])


def test_embed_tokens_dtype():
    params = init_params(CFG, jax.random.key(0))
    x = embed_tokens(params, jnp.zeros((1, 4), jnp.int32))
    assert x.dtype == jnp.bfloat16
    assert x.shape == (1, 4, CFG.hidden_size)
