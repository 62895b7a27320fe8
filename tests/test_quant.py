"""Quantizer unit tests: parity with reference semantics (SURVEY.md §2.1).

The oracle is an independent numpy reimplementation of the published
formulas (reference gptq_utils.py:249-272), including the 1e-5 clamps and
static-group expansion.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tgq.core.quant import (
    QuantSpec,
    dequantize,
    expand_params,
    fake_quantize,
    find_params,
    quantize,
)


def numpy_reference_params(w, bits, group_size, sym):
    m, n = w.shape
    g = group_size if group_size > 0 else n
    wg = w.reshape(m, n // g, g).astype(np.float64)
    if sym:
        max_q = 2 ** (bits - 1) - 1
        amax = np.maximum(np.abs(wg).max(axis=2), 1e-5)
        scale = amax / max_q
        zero = np.zeros_like(scale)
    else:
        max_q = 2**bits - 1
        mn, mx = wg.min(axis=2), wg.max(axis=2)
        scale = np.maximum(mx - mn, 1e-5) / max_q
        zero = np.clip(np.floor(-mn / scale + 0.5), 0, max_q)
    return scale, zero


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
@pytest.mark.parametrize("group_size", [-1, 128])
@pytest.mark.parametrize("sym", [False, True])
def test_find_params_matches_reference(rng, bits, group_size, sym):
    w = rng.normal(size=(16, 256)).astype(np.float32)
    spec = QuantSpec(bits=bits, group_size=group_size, sym=sym)
    p = find_params(jnp.asarray(w), spec)
    ref_scale, ref_zero = numpy_reference_params(w, bits, group_size, sym)
    np.testing.assert_allclose(np.asarray(p.scale), ref_scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p.zero), ref_zero, rtol=0, atol=0)


def test_quant_range_and_roundtrip(rng):
    for sym in (False, True):
        spec = QuantSpec(bits=4, group_size=64, sym=sym)
        w = rng.normal(size=(8, 128)).astype(np.float32)
        p = find_params(jnp.asarray(w), spec)
        scale, zero = expand_params(p, 128)
        q = quantize(jnp.asarray(w), scale, zero, spec)
        assert q.min() >= spec.min_q and q.max() <= spec.max_q
        # codes are integers
        np.testing.assert_array_equal(np.asarray(q), np.round(np.asarray(q)))
        wq = dequantize(q, scale, zero)
        # max reconstruction error is bounded by scale/2 per element
        err = np.abs(np.asarray(wq - jnp.asarray(w)))
        bound = np.asarray(scale) * 0.5 + 1e-6
        assert (err <= bound).all()


def test_int8_roundtrip_near_exact(rng):
    spec = QuantSpec(bits=8, group_size=-1, sym=False)
    w = rng.normal(size=(4, 64)).astype(np.float32)
    wq = fake_quantize(jnp.asarray(w), spec)
    assert np.abs(np.asarray(wq) - w).max() < np.abs(w).max() / 100


def test_zero_weight_rows_do_not_nan():
    spec = QuantSpec(bits=4, group_size=-1, sym=False)
    w = jnp.zeros((4, 64), jnp.float32)
    wq = fake_quantize(w, spec)
    assert np.isfinite(np.asarray(wq)).all()


def test_static_groups_expansion(rng):
    spec = QuantSpec(bits=4, group_size=32, sym=False)
    w = rng.normal(size=(2, 128)).astype(np.float32)
    p = find_params(jnp.asarray(w), spec)
    scale, zero = expand_params(p, 128)
    assert scale.shape == (2, 128)
    # each group's expanded values are constant within the group
    s = np.asarray(scale).reshape(2, 4, 32)
    assert (s == s[:, :, :1]).all()
