"""Pallas GPTQ block kernel vs jnp oracle — exact-equality tests.

Runs in Pallas interpret mode on CPU (SURVEY.md §4 build implication);
the same code path compiles with Mosaic on TPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgq.core.quant import QuantSpec
from tgq.kernels.gptq_block import process_block_pallas
from tgq.solver.gptq_loop import _process_block_jnp, quantize_weight
from tgq.solver import trunc_spectral_factor
from tgq.solver.hessian import hessian_from_activations


def make_inputs(rng, m, b):
    w = rng.normal(size=(m, b)).astype(np.float32)
    s = (0.01 + rng.uniform(size=(m, b)) * 0.2).astype(np.float32)
    z = rng.integers(0, 15, size=(m, b)).astype(np.float32)
    # well-conditioned upper-triangular R with positive diagonal
    a = rng.normal(size=(b, b)).astype(np.float64) / np.sqrt(b)
    r = np.linalg.qr(a)[1]
    r *= np.sign(np.diagonal(r))[:, None]
    r += np.eye(b) * 0.5
    return w, s, z, r.astype(np.float32)


@pytest.mark.parametrize("m,b", [(8, 16), (100, 128), (256, 96), (300, 256)])
def test_pallas_matches_jnp_oracle(rng, m, b):
    w, s, z, r = make_inputs(rng, m, b)
    args = tuple(map(jnp.asarray, (w, s, z, r)))
    q_ref, e_ref = _process_block_jnp(*args, -7, 7)
    q_pl, e_pl = process_block_pallas(*args, -7, 7, rows_per_tile=64)
    np.testing.assert_allclose(np.asarray(q_pl), np.asarray(q_ref), atol=0)
    np.testing.assert_allclose(np.asarray(e_pl), np.asarray(e_ref), rtol=1e-5, atol=1e-5)


def test_pallas_row_padding_exact(rng):
    # rows not a multiple of the tile: padded rows must not contaminate
    m, b = 70, 64
    w, s, z, r = make_inputs(rng, m, b)
    args = tuple(map(jnp.asarray, (w, s, z, r)))
    q64, e64 = process_block_pallas(*args, 0, 15, rows_per_tile=64)
    q8, e8 = process_block_pallas(*args, 0, 15, rows_per_tile=8)
    np.testing.assert_array_equal(np.asarray(q64), np.asarray(q8))
    np.testing.assert_allclose(np.asarray(e64), np.asarray(e8), rtol=1e-6)


def test_quantize_weight_pallas_backend_end_to_end(rng):
    m, n = 32, 128
    x = rng.normal(size=(4096, n)).astype(np.float32)
    h = hessian_from_activations(jnp.asarray(x))
    f = trunc_spectral_factor(np.asarray(h), eps=1e-8, method="energy")
    w = rng.normal(size=(m, n)).astype(np.float32)
    spec = QuantSpec(bits=4, group_size=64, sym=False)
    res_jnp = quantize_weight(jnp.asarray(w), f, spec, block_size=64, backend="jnp")
    res_pl = quantize_weight(jnp.asarray(w), f, spec, block_size=64, backend="pallas")
    np.testing.assert_array_equal(np.asarray(res_pl.codes), np.asarray(res_jnp.codes))
    np.testing.assert_allclose(
        np.asarray(res_pl.w_q), np.asarray(res_jnp.w_q), rtol=1e-6, atol=1e-6
    )
