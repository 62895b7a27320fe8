"""Fused dequant-matmul kernel vs dequantize-then-matmul oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgq.core.packing import PackedLinear
from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
from tgq.kernels.dequant_matmul import quantized_matmul


def make_packed(rng, m, n, bits, group_size, sym=False):
    spec = QuantSpec(bits=bits, group_size=group_size, sym=sym)
    w = rng.normal(size=(m, n)).astype(np.float32)
    p = find_params(jnp.asarray(w), spec)
    s, z = expand_params(p, n)
    q = quantize(jnp.asarray(w), s, z, spec).astype(jnp.int32)
    return PackedLinear.from_codes(q, p.scale, p.zero, spec)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pallas_matches_xla(rng, bits):
    pl_w = make_packed(rng, 256, 512, bits, 128)
    x = jnp.asarray(rng.normal(size=(16, 512)).astype(np.float32))
    y_ref = quantized_matmul(x, pl_w, impl="xla")
    y = quantized_matmul(x, pl_w, impl="pallas", token_tile=8,
                         out_tile=128, k_tile=256)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-3)


def test_sym_path(rng):
    pl_w = make_packed(rng, 128, 256, 4, 64, sym=True)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    y_ref = quantized_matmul(x, pl_w, impl="xla")
    y = quantized_matmul(x, pl_w, impl="pallas", token_tile=8,
                         out_tile=128, k_tile=128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-3)


def test_leading_dims_and_bf16(rng):
    pl_w = make_packed(rng, 128, 256, 4, 128)
    x = jnp.asarray(rng.normal(size=(2, 5, 256)).astype(np.float32)).astype(jnp.bfloat16)
    y = quantized_matmul(x, pl_w, impl="pallas", token_tile=8,
                         out_tile=128, k_tile=256)
    assert y.shape == (2, 5, 128)
    assert y.dtype == jnp.bfloat16
    y_ref = quantized_matmul(x, pl_w, impl="xla")
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=5e-2, atol=5e-1)


def test_matches_true_weight_error_level(rng):
    """The kernel's output error vs the ORIGINAL dense weight is the
    quantization error, not a kernel bug: compare against fake-quant."""
    spec = QuantSpec(bits=4, group_size=128, sym=False)
    w = rng.normal(size=(128, 512)).astype(np.float32)
    p = find_params(jnp.asarray(w), spec)
    s, z = expand_params(p, 512)
    q = quantize(jnp.asarray(w), s, z, spec).astype(jnp.int32)
    pl_w = PackedLinear.from_codes(q, p.scale, p.zero, spec)
    wq = np.asarray((q.astype(jnp.float32) - z) * s)
    x = rng.normal(size=(8, 512)).astype(np.float32)
    y = np.asarray(quantized_matmul(jnp.asarray(x), pl_w, impl="pallas",
                                    token_tile=8, out_tile=128, k_tile=512))
    # native TPU: the kernel's MXU dot is single-pass bf16 (the kernel
    # is DMA-bound at decode — X3 would triple MXU time for error
    # already far below W4 quantization noise), so per-element error is
    # ~sqrt(K)*eps_bf16*|rows| independent of |y|; assert the relative
    # Frobenius error instead of elementwise closeness (exact-f32 on
    # CPU interpret, bf16-grade on silicon)
    want = x @ wq.T
    rel = np.linalg.norm(y - want) / np.linalg.norm(want)
    assert rel < 1e-2, rel


@pytest.mark.parametrize("bits", [2, 3, 4])
def test_a8_matches_quantized_activation_oracle(rng, bits):
    """W4A8 kernel (int8 activations × zero-shifted int8 codes on the
    MXU, per-group f32 scale accumulate) == dequantize-everything
    oracle on the SAME quantized activations: the asym zero-point is
    integer-valued so q − z fits int8 and the int32 dot is exact."""
    import dataclasses

    from tgq.kernels.dequant_matmul import quantize_activations

    pl_w = make_packed(rng, 256, 512, bits, 128)
    w8 = dataclasses.replace(pl_w, act_bits=8)
    x = jnp.asarray(rng.normal(size=(16, 512)).astype(np.float32))
    x8, a = quantize_activations(x)
    xq = x8.astype(jnp.float32) * a
    y_ref = quantized_matmul(xq, pl_w, impl="xla")
    y = quantized_matmul(x, w8, impl="pallas", token_tile=8,
                         out_tile=128, k_tile=256)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-3)


def test_a8_sym_and_bias(rng):
    import dataclasses

    pl_w = make_packed(rng, 128, 256, 4, 128, sym=True)
    pl_w = dataclasses.replace(
        pl_w, bias=jnp.asarray(rng.normal(size=(128,)).astype(np.float32)))
    w8 = dataclasses.replace(pl_w, act_bits=8)
    from tgq.kernels.dequant_matmul import quantize_activations

    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    x8, a = quantize_activations(x)
    y_ref = quantized_matmul(x8.astype(jnp.float32) * a, pl_w, impl="xla")
    y = quantized_matmul(x, w8, impl="pallas", token_tile=8,
                         out_tile=128, k_tile=256)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-3)


def test_a8_stacked_layer_index(rng):
    """Layer-stacked A8 (the decode scan's form): 3-D codes + traced
    layer index through the scalar-prefetch grid."""
    import dataclasses

    from tgq.kernels.dequant_matmul import quantize_activations

    ws = [make_packed(rng, 128, 256, 4, 128) for _ in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ws)
    stacked8 = dataclasses.replace(stacked, act_bits=8)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    x8, a = quantize_activations(x)
    for li in range(3):
        y = quantized_matmul(x, stacked8, impl="pallas", token_tile=8,
                             out_tile=128, k_tile=256,
                             layer=jnp.int32(li))
        y_ref = quantized_matmul(x8.astype(jnp.float32) * a, ws[li],
                                 impl="xla")
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-4, atol=2e-3)
