"""Paged decode-attention kernel vs a numpy oracle.

The fused kernel (tgq.kernels.paged_attention) only lowers on real TPU
hardware (manual DMA descriptors are not supported by pallas interpret
mode), so the kernel-vs-oracle checks are TPU-gated; the oracle itself
and the engine's CPU fallback path are covered by test_serve.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs real TPU (manual DMA)")

L, KVH, P, PG, D = 3, 4, 40, 16, 128
B, H = 6, 16  # GQA group = 4
MPPS = 4
FUSED = KVH * D


def oracle(q, kf, vf, lens, table):
    """q (B,H,D); kf/vf (P,PG,KVH,D) f32 for one layer."""
    out = np.zeros((B, H, D), np.float32)
    g = H // KVH
    for b in range(B):
        T = int(lens[b])
        if T == 0:
            continue
        ks = np.concatenate([kf[table[b, i]] for i in range(MPPS)], axis=0)
        vs = np.concatenate([vf[table[b, i]] for i in range(MPPS)], axis=0)
        for h in range(H):
            kh = h // g
            logits = ks[:T, kh] @ q[b, h]
            p = np.exp(logits - logits.max())
            p /= p.sum()
            out[b, h] = p @ vs[:T, kh]
    return out


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, D)).astype(np.float32) * 0.3
    lens = np.array([9, 0, 16, 33, 64, 1], np.int32)
    table = rng.permutation(P - 1)[: B * MPPS].reshape(B, MPPS).astype(
        np.int32) + 1
    return rng, q, lens, table


@tpu_only
def test_kernel_bf16_matches_oracle(setup):
    from tgq.kernels.paged_attention import paged_decode_attention

    rng, q, lens, table = setup
    kpool = (rng.standard_normal((L, P, PG, KVH, D)) * 0.5).astype(np.float32)
    vpool = (rng.standard_normal((L, P, PG, KVH, D)) * 0.5).astype(np.float32)
    for li in (0, 2):
        want = oracle(q, kpool[li], vpool[li], lens, table)
        got = np.asarray(paged_decode_attention(
            jnp.asarray(q),
            jnp.asarray(kpool.reshape(L, P, PG, FUSED), jnp.bfloat16),
            jnp.asarray(vpool.reshape(L, P, PG, FUSED), jnp.bfloat16),
            None, None, jnp.int32(li), jnp.asarray(lens), jnp.asarray(table),
            num_kv_heads=KVH), np.float32)
        live = lens > 0
        rel = np.linalg.norm((got - want)[live]) / np.linalg.norm(want[live])
        assert rel < 2e-2, (li, rel)       # bf16 storage + bf16-grade dots
        assert np.all(got[~live] == 0)


@tpu_only
def test_kernel_int8_matches_oracle(setup):
    from tgq.kernels.paged_attention import paged_decode_attention

    rng, q, lens, table = setup
    ki8 = rng.integers(-127, 128, (L, P, PG, KVH, D)).astype(np.int8)
    vi8 = rng.integers(-127, 128, (L, P, PG, KVH, D)).astype(np.int8)
    spad = 128
    ks = np.zeros((L, P, KVH, spad), np.float32)
    vs = np.zeros((L, P, KVH, spad), np.float32)
    ks[..., :PG] = rng.random((L, P, KVH, PG)) * 0.02 + 0.001
    vs[..., :PG] = rng.random((L, P, KVH, PG)) * 0.02 + 0.001
    kf = ki8.astype(np.float32) * ks[..., :PG].transpose(0, 1, 3, 2)[..., None]
    vf = vi8.astype(np.float32) * vs[..., :PG].transpose(0, 1, 3, 2)[..., None]
    li = 1
    want = oracle(q, kf[li], vf[li], lens, table)
    got = np.asarray(paged_decode_attention(
        jnp.asarray(q),
        jnp.asarray(ki8.reshape(L, P, PG, FUSED)),
        jnp.asarray(vi8.reshape(L, P, PG, FUSED)),
        jnp.asarray(ks), jnp.asarray(vs),
        jnp.int32(li), jnp.asarray(lens), jnp.asarray(table),
        num_kv_heads=KVH), np.float32)
    live = lens > 0
    rel = np.linalg.norm((got - want)[live]) / np.linalg.norm(want[live])
    # int8 codes are bf16-exact; error is the single-pass-bf16 MXU dots
    assert rel < 5e-3, rel


@tpu_only
def test_stacked_weight_matmul_matches_sliced():
    """quantized_matmul(layer=i) on stacked packed weights == per-layer."""
    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec
    from tgq.kernels.dequant_matmul import quantized_matmul

    rng = np.random.default_rng(1)
    spec = QuantSpec(bits=4, group_size=128, sym=False)
    layers = []
    for _ in range(3):
        codes = jnp.asarray(rng.integers(0, 16, (512, 256)), jnp.int32)
        scale = jnp.asarray(rng.random((512, 2)) * 0.02 + 0.01, jnp.float32)
        zero = jnp.asarray(np.round(rng.random((512, 2)) * 15), jnp.float32)
        layers.append(PackedLinear.from_codes(codes, scale, zero, spec))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    for li in range(3):
        want = np.asarray(quantized_matmul(x, layers[li]), np.float32)
        got = np.asarray(
            quantized_matmul(x, stacked, layer=jnp.int32(li)), np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@tpu_only
def test_kernel_inline_current_token(setup):
    """k_current/v_current path == writing the current token to the pool
    first (the oracle attends over all `lens` tokens)."""
    from tgq.kernels.paged_attention import paged_decode_attention

    rng, q, lens, table = setup
    kpool = (rng.standard_normal((L, P, PG, KVH, D)) * 0.5).astype(np.float32)
    vpool = (rng.standard_normal((L, P, PG, KVH, D)) * 0.5).astype(np.float32)
    li = 1
    want = oracle(q, kpool[li], vpool[li], lens, table)

    # deferred form: pools hold tokens [0, len-1); last token in registers
    kd = kpool.copy()
    vd = vpool.copy()
    kcur = np.zeros((B, KVH * D), np.float32)
    vcur = np.zeros((B, KVH * D), np.float32)
    for b in range(B):
        T = int(lens[b])
        if T == 0:
            continue
        pg = table[b, (T - 1) // PG]
        off = (T - 1) % PG
        kcur[b] = kpool[li, pg, off].reshape(-1)
        vcur[b] = vpool[li, pg, off].reshape(-1)
        kd[li, pg, off] = np.nan  # kernel must NOT read the pool there
        vd[li, pg, off] = np.nan

    got = np.asarray(paged_decode_attention(
        jnp.asarray(q),
        jnp.asarray(kd.reshape(L, P, PG, FUSED), jnp.bfloat16),
        jnp.asarray(vd.reshape(L, P, PG, FUSED), jnp.bfloat16),
        None, None, jnp.int32(li), jnp.asarray(lens), jnp.asarray(table),
        jnp.asarray(kcur), jnp.asarray(vcur),
        num_kv_heads=KVH), np.float32)
    live = lens > 0
    rel = np.linalg.norm((got - want)[live]) / np.linalg.norm(want[live])
    assert np.isfinite(got).all()
    assert rel < 2e-2, rel
    assert np.all(got[~live] == 0)


@tpu_only
@pytest.mark.parametrize("bits", [8, 4, 3, 2])
def test_pallas_matmul_all_bitwidths_vs_dequant(bits):
    """Fused dequant-matmul (pallas) == x @ dequantize().T at every
    supported bit-width, with non-trivial scales/zeros and bias."""
    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec
    from tgq.kernels.dequant_matmul import quantized_matmul

    rng = np.random.default_rng(bits)
    spec = QuantSpec(bits=bits, group_size=128, sym=False)
    maxq = (1 << bits) - 1
    codes = jnp.asarray(rng.integers(0, maxq + 1, (512, 256)), jnp.int32)
    scale = jnp.asarray(rng.random((512, 2)) * 0.02 + 0.01, jnp.float32)
    zero = jnp.asarray(np.round(rng.random((512, 2)) * maxq), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(512), jnp.float32)
    w = PackedLinear.from_codes(codes, scale, zero, spec, bias=bias)
    x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
    want = np.asarray(x @ w.dequantize(jnp.float32).T + bias, np.float32)
    got = np.asarray(quantized_matmul(x, w, impl="pallas"), np.float32)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-6, (bits, rel)


@tpu_only
def test_stacked_matmul_with_bias_matches_sliced():
    """Layer-indexed stacked path adds the right layer's bias."""
    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec
    from tgq.kernels.dequant_matmul import quantized_matmul

    rng = np.random.default_rng(9)
    spec = QuantSpec(bits=4, group_size=128, sym=False)
    layers = []
    for i in range(3):
        codes = jnp.asarray(rng.integers(0, 16, (512, 256)), jnp.int32)
        scale = jnp.asarray(rng.random((512, 2)) * 0.02 + 0.01, jnp.float32)
        zero = jnp.asarray(np.round(rng.random((512, 2)) * 15), jnp.float32)
        bias = jnp.asarray(np.full(512, float(i + 1)), jnp.float32)
        layers.append(PackedLinear.from_codes(codes, scale, zero, spec,
                                              bias=bias))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    for li in range(3):
        want = np.asarray(quantized_matmul(x, layers[li]), np.float32)
        got = np.asarray(
            quantized_matmul(x, stacked, layer=jnp.int32(li)), np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@tpu_only
def test_kernel_int4_matches_oracle(setup):
    """Nibble-packed INT4 KV pools through the fused kernel == oracle
    on the dequantized values (codes are bf16-exact; same scale trick
    as int8)."""
    from tgq.kernels.paged_attention import paged_decode_attention
    from tgq.serve.kv_cache import kv_unpack4

    rng, q, lens, table = setup
    # packed codes: bytes hold two [0,15] nibbles (bias 8)
    kp = rng.integers(0, 256, (L, P, PG, FUSED // 2)).astype(np.uint8)
    vp = rng.integers(0, 256, (L, P, PG, FUSED // 2)).astype(np.uint8)
    spad = 128
    ks = np.zeros((L, P, KVH, spad), np.float32)
    vs = np.zeros((L, P, KVH, spad), np.float32)
    ks[..., :PG] = rng.random((L, P, KVH, PG)) * 0.1 + 0.01
    vs[..., :PG] = rng.random((L, P, KVH, PG)) * 0.1 + 0.01
    # dequantized reference pools
    kf = np.asarray(kv_unpack4(jnp.asarray(kp))).reshape(L, P, PG, KVH, D) \
        * ks[..., :PG].transpose(0, 1, 3, 2)[..., None]
    vf = np.asarray(kv_unpack4(jnp.asarray(vp))).reshape(L, P, PG, KVH, D) \
        * vs[..., :PG].transpose(0, 1, 3, 2)[..., None]
    li = 2
    want = oracle(q, kf[li], vf[li], lens, table)
    got = np.asarray(paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(ks), jnp.asarray(vs),
        jnp.int32(li), jnp.asarray(lens), jnp.asarray(table),
        num_kv_heads=KVH), np.float32)
    live = lens > 0
    rel = np.linalg.norm((got - want)[live]) / np.linalg.norm(want[live])
    assert rel < 5e-3, rel
