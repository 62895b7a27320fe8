"""Paged decode-attention kernel vs a numpy oracle.

The fused kernel (tgq.kernels.paged_attention) uses manual DMA
descriptors, which the plain (HLO) pallas interpreter cannot emulate —
but jax's **TPU interpret mode** can (simulated HBM/VMEM, DMAs,
semaphores, plus a vector-clock race detector).  On CPU every test in
this module runs the real kernel code under
``force_tpu_interpret_mode(detect_races=True)``; on real TPU the same
tests run natively.  So the kernel paths (multi-page DMA, int8/int4
in-kernel dequant, deferred current-token fold-in, scalar-prefetch
layer indexing) are exercised — and race-checked — on every CPU suite
run, not only when a chip is attached.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

ON_TPU = jax.default_backend() == "tpu"

# kept as a no-op marker so the module reads the same on both backends
tpu_only = pytest.mark.skipif(False, reason="")


@pytest.fixture(autouse=True)
def _tpu_or_interpret():
    """Native on TPU; simulated TPU (with race detection) on CPU."""
    if ON_TPU:
        yield
        return
    from jax._src.pallas.mosaic.interpret.interpret_pallas_call import (
        InterpretParams,
        force_tpu_interpret_mode,
    )

    with force_tpu_interpret_mode(InterpretParams(detect_races=True)):
        yield

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

    # deferred form: pools hold tokens [0, len-1); last token in registers.
    # The pool position of the current token is overwritten with a
    # sentinel (logit 0, value 1e6): the kernel DMAs whole pages by
    # design and excludes dead positions via softmax masking, so if it
    # wrongly *included* this position the 1e6 value row would shift the
    # output by ~1e6/T — NaN poisoning would instead fail the masking
    # math itself (0·NaN), which is not part of the kernel's contract.
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
        kd[li, pg, off] = 0.0   # in-range logit → non-negligible weight
        vd[li, pg, off] = 1e6   # would blow up the output if included

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


def test_full_decode_step_kernel_matches_gather():
    """The composed decode path (decode_steps, attn_impl="kernel":
    layer scan + fused attention + deferred batched KV write + sampling)
    matches the gather fallback token-for-token on the tiny model, with
    int8 KV **and per-channel equalizers** — the kernel-path eq algebra
    (q-fold / output-scale / current-token divide) was previously
    untestable off-chip."""
    import dataclasses

    from tgq.models import PRESETS, init_params
    from tgq.serve.decode import decode_steps, prefill_batch, stack_layer_params
    from tgq.serve.kv_cache import PagedKVCache

    cfg = PRESETS["tiny-qwen3-kv128"]
    params = stack_layer_params(init_params(cfg, jax.random.key(0)))
    page, n_pages, slots, mpps = 8, 32, 2, 4
    k_eq = np.exp(np.random.default_rng(5).normal(
        0, 0.5, (cfg.num_layers, cfg.num_kv_heads * cfg.head_dim))
    ).astype(np.float32)
    v_eq = k_eq[::-1].copy()

    def run(attn_impl):
        cache = PagedKVCache.init(cfg, n_pages, page, kv_bits=8,
                                  k_eq=k_eq, v_eq=v_eq)
        # prefill one prompt of 8 tokens into slot 0's first page
        ids = np.zeros((slots, page), np.int32)
        ids[0, :8] = [5, 17, 42, 100, 7, 9, 3, 1]
        slot_pages = np.asarray([[1], [2]], np.int32)
        toks, cache, key = prefill_batch(
            params, cache, cfg, jnp.asarray(slot_pages), jnp.asarray(ids),
            jnp.asarray([8, 1], np.int32), jnp.zeros((slots,), np.float32),
            jax.random.key(0))
        table = np.zeros((slots, mpps), np.int32)
        table[0, 0] = 1
        table[0, 1] = 3  # decode continues into page 3
        table[1, 0] = 2
        lens0 = np.asarray([8, 1], np.int32)
        out, cache, _ = decode_steps(
            params, cache, cfg, jnp.asarray(table),
            jnp.asarray(lens0 + 1), toks, jnp.asarray(lens0),
            jnp.zeros((slots,), np.float32), key, 4, attn_impl)
        return np.asarray(toks), np.asarray(out)

    pre_g, toks_g = run("gather")
    pre_k, toks_k = run("kernel")
    np.testing.assert_array_equal(pre_g, pre_k)
    np.testing.assert_array_equal(toks_g[:, 0], toks_k[:, 0])


def test_engine_kernel_attn_matches_gather_end_to_end():
    """Whole Engine lifecycle (admission prefill, chunked decode,
    speculative pipelining, retirement) with attn_impl='kernel'.

    On CPU (TPU interpret mode) both attention impls compute in exact
    f32, so kernel == gather token-for-token.  On real hardware both are
    deliberately bf16-grade with different reduction orders, so argmax
    near-ties on a random-init tiny model can legitimately flip; there
    the invariants are (a) the kernel engine is deterministic across two
    full lifecycles and (b) every request completes with the requested
    token count.  (Logit-level kernel-vs-gather agreement on hardware is
    covered by test_full_decode_step_kernel_matches_gather.)"""
    import copy

    from tgq.models import PRESETS, init_params
    from tgq.serve import Engine, ServeConfig

    cfg = PRESETS["tiny-qwen3-kv128"]
    params = init_params(cfg, jax.random.key(0))
    prompts = [[5, 17, 42], [7, 9, 3, 1, 4]]

    def run(attn_impl):
        scfg = ServeConfig(max_slots=2, page_size=8, num_pages=32,
                           max_pages_per_slot=4, max_new_tokens=6,
                           decode_chunk=4, kv_bits=8, attn_impl=attn_impl)
        eng = Engine(copy.deepcopy(params), cfg, scfg)
        reqs = [eng.submit(p) for p in prompts]
        eng.run()
        return [r.output for r in reqs]

    kernel_out = run("kernel")
    assert [len(o) for o in kernel_out] == [6, 6]
    if ON_TPU:
        assert run("kernel") == kernel_out
    else:
        assert run("gather") == kernel_out


def _tp_case(int8: bool):
    """Small-geometry TP case (interpret mode simulates the kernel once
    per shard, so these stay deliberately tiny): 2 layers, 6 pages of 8
    tokens, 3 slots, 4 kv heads x 32 features, GQA group 2."""
    l, p, pg, kvh, d = 2, 8, 8, 4, 32
    b, h, mpps = 3, 8, 2
    fused = kvh * d
    rng = np.random.default_rng(7)
    q = rng.standard_normal((b, h, d)).astype(np.float32) * 0.3
    lens = np.array([5, 0, 14], np.int32)
    table = rng.permutation(p - 1)[: b * mpps].reshape(b, mpps).astype(
        np.int32) + 1
    kcur = (rng.standard_normal((b, fused)) * 0.5).astype(np.float32)
    vcur = (rng.standard_normal((b, fused)) * 0.5).astype(np.float32)
    from tgq.serve.kv_cache import PagedKVCache

    if int8:
        ki8 = rng.integers(-127, 128, (l, p, pg, fused)).astype(np.int8)
        vi8 = rng.integers(-127, 128, (l, p, pg, fused)).astype(np.int8)
        spad = 128
        ks = np.zeros((l, p, kvh, spad), np.float32)
        vs = np.zeros((l, p, kvh, spad), np.float32)
        ks[..., :pg] = rng.random((l, p, kvh, pg)) * 0.02 + 0.001
        vs[..., :pg] = rng.random((l, p, kvh, pg)) * 0.02 + 0.001
        cache = PagedKVCache(
            k=jnp.asarray(ki8), v=jnp.asarray(vi8),
            ks=jnp.asarray(ks), vs=jnp.asarray(vs), num_kv_heads=kvh)
    else:
        kf = (rng.standard_normal((l, p, pg, fused)) * 0.5).astype(np.float32)
        vf = (rng.standard_normal((l, p, pg, fused)) * 0.5).astype(np.float32)
        cache = PagedKVCache(
            k=jnp.asarray(kf, jnp.bfloat16),
            v=jnp.asarray(vf, jnp.bfloat16), num_kv_heads=kvh)
    return kvh, q, lens, table, kcur, vcur, cache


@pytest.mark.parametrize("int8", [False, True])
def test_kernel_tp_sharded_matches_single_device(int8):
    """_kernel_attention_tp (shard_map over the model axis, kernel per
    shard on its kv-head slice) == the single-device kernel on the same
    global pools.  8 CPU devices, ("data", "model") = (4, 2); int8 also
    checks the per-token-per-head scales shard on the kv-head dim."""
    from tgq.parallel import make_mesh
    from tgq.serve.decode import _kernel_attention_tp
    from tgq.kernels.paged_attention import paged_decode_attention

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=4, devices=devs[:8])  # model axis = 2

    kvh, q, lens, table, kcur, vcur, cache = _tp_case(int8)
    li = 1
    want = np.asarray(paged_decode_attention(
        jnp.asarray(q), cache.k, cache.v, cache.ks, cache.vs,
        jnp.int32(li), jnp.asarray(lens), jnp.asarray(table),
        jnp.asarray(kcur), jnp.asarray(vcur),
        num_kv_heads=kvh), np.float32)
    got = np.asarray(_kernel_attention_tp(
        kvh, jnp.asarray(q), cache, jnp.int32(li), jnp.asarray(lens),
        jnp.asarray(table), jnp.asarray(kcur), jnp.asarray(vcur),
        mesh), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("int8", [False, True])
def test_kernel_chunk_window_matches_oracle(int8):
    """Kernel flash partials (pools + current-token registers,
    return_stats=True) merged with the XLA raw-window softmax block ==
    oracle over the full token set (the decode_steps chunk-window
    layout: pools [0, len-1-w), raw window rows w, current in
    registers)."""
    from tgq.kernels.paged_attention import paged_decode_attention
    from tgq.serve.decode import _merge_partials, _window_partial

    rng = np.random.default_rng(11)
    L2, W, wl = 2, 4, 3
    lens = np.array([9, 0, 16, 33, 64, 4], np.int32)
    q = rng.standard_normal((B, H, D)).astype(np.float32) * 0.3
    table = rng.permutation(P - 1)[: B * MPPS].reshape(B, MPPS).astype(
        np.int32) + 1
    li = 1

    # full per-slot token values (dequantized ground truth)
    if int8:
        kpool_i = rng.integers(-127, 128, (L2, P, PG, FUSED)).astype(np.int8)
        vpool_i = rng.integers(-127, 128, (L2, P, PG, FUSED)).astype(np.int8)
        spad = 128
        ks = np.zeros((L2, P, KVH, spad), np.float32)
        vs = np.zeros((L2, P, KVH, spad), np.float32)
        ks[..., :PG] = rng.random((L2, P, KVH, PG)) * 0.02 + 0.001
        vs[..., :PG] = rng.random((L2, P, KVH, PG)) * 0.02 + 0.001
        kf = (kpool_i.reshape(L2, P, PG, KVH, D).astype(np.float32)
              * ks[..., :PG].transpose(0, 1, 3, 2)[..., None])
        vf = (vpool_i.reshape(L2, P, PG, KVH, D).astype(np.float32)
              * vs[..., :PG].transpose(0, 1, 3, 2)[..., None])
        pools = (jnp.asarray(kpool_i), jnp.asarray(vpool_i),
                 jnp.asarray(ks), jnp.asarray(vs))
    else:
        kf = (rng.standard_normal((L2, P, PG, KVH, D)) * 0.5).astype(
            np.float32)
        vf = (rng.standard_normal((L2, P, PG, KVH, D)) * 0.5).astype(
            np.float32)
        pools = (jnp.asarray(kf.reshape(L2, P, PG, FUSED), jnp.bfloat16),
                 jnp.asarray(vf.reshape(L2, P, PG, FUSED), jnp.bfloat16),
                 None, None)
        # oracle must see the bf16-rounded stored values
        kf = np.asarray(jnp.asarray(kf, jnp.bfloat16), np.float32)
        vf = np.asarray(jnp.asarray(vf, jnp.bfloat16), np.float32)

    # the chunk window is ALWAYS raw bf16 rows in (L, B, kvh, W, d)
    # layout (independent of pool format — tgq.serve.kv_cache
    # .window_init)
    wkf = (rng.standard_normal((L2, B, W, KVH, D)) * 0.5).astype(np.float32)
    wvf = (rng.standard_normal((L2, B, W, KVH, D)) * 0.5).astype(np.float32)
    win = (jnp.asarray(wkf.transpose(0, 1, 3, 2, 4), jnp.bfloat16),
           jnp.asarray(wvf.transpose(0, 1, 3, 2, 4), jnp.bfloat16))
    wkf = np.asarray(jnp.asarray(wkf, jnp.bfloat16), np.float32)
    wvf = np.asarray(jnp.asarray(wvf, jnp.bfloat16), np.float32)

    kcur = (rng.standard_normal((B, FUSED)) * 0.5).astype(np.float32)
    vcur = (rng.standard_normal((B, FUSED)) * 0.5).astype(np.float32)

    # oracle: per slot, tokens = pools[0:ln-1-wl] ++ window[0:wl] ++ cur
    out_ref = np.zeros((B, H, D), np.float32)
    g = H // KVH
    for b in range(B):
        ln = int(lens[b])
        if ln == 0:
            continue
        npool = max(ln - 1 - wl, 0)
        pool_k = np.concatenate(
            [kf[li, table[b, i]] for i in range(MPPS)], axis=0)[:npool]
        pool_v = np.concatenate(
            [vf[li, table[b, i]] for i in range(MPPS)], axis=0)[:npool]
        ks_all = np.concatenate(
            [pool_k, wkf[li, b, :wl],
             kcur[b].reshape(1, KVH, D)], axis=0)
        vs_all = np.concatenate(
            [pool_v, wvf[li, b, :wl],
             vcur[b].reshape(1, KVH, D)], axis=0)
        for h in range(H):
            kh = h // g
            logits = ks_all[:, kh] @ q[b, h]
            pr = np.exp(logits - logits.max())
            pr /= pr.sum()
            out_ref[b, h] = pr @ vs_all[:, kh]

    kern = paged_decode_attention(
        jnp.asarray(q), pools[0], pools[1], pools[2], pools[3],
        jnp.int32(li), jnp.asarray(lens), jnp.asarray(table),
        jnp.asarray(kcur), jnp.asarray(vcur),
        w_live=jnp.int32(wl),
        num_kv_heads=KVH, return_stats=True)
    winp = _window_partial(jnp.asarray(q), win, jnp.int32(li),
                           jnp.int32(wl), KVH)
    got = np.asarray(_merge_partials(kern, winp), np.float32)
    live = lens > 0
    rel = (np.linalg.norm((got - out_ref)[live])
           / np.linalg.norm(out_ref[live]))
    assert np.isfinite(got[live]).all()
    assert rel < 2e-2, (int8, rel)


def test_glu_fused_matmul_matches_split():
    """quantized_matmul(glu=True) — silu(gate)·up computed inside the
    kernel from two BlockSpec views of one buffer — equals the split
    silu-then-matmul form, stacked and unstacked."""
    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec
    from tgq.kernels.dequant_matmul import quantized_matmul

    rng = np.random.default_rng(5)
    spec = QuantSpec(bits=4, group_size=128, sym=False)
    n, m = 256, 128  # in_features, out_features
    layers = []
    for _ in range(2):
        # from_codes wants (out, in) codes and (out, groups) params
        codes = jnp.asarray(rng.integers(0, 16, (m, n)), jnp.int32)
        scale = jnp.asarray(rng.random((m, n // 128)) * 0.02 + 0.01,
                            jnp.float32)
        zero = jnp.asarray(np.round(rng.random((m, n // 128)) * 15),
                           jnp.float32)
        layers.append(PackedLinear.from_codes(codes, scale, zero, spec))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    gu = jnp.asarray(rng.standard_normal((8, 2 * n)), jnp.float32)

    def split_ref(w):
        g, u = np.asarray(gu[:, :n]), np.asarray(gu[:, n:])
        act = g / (1 + np.exp(-g)) * u
        return act @ np.asarray(w.dequantize(jnp.float32)).T

    def check(got, want):
        # native TPU MXU dots are single-pass bf16 (error norm-scaled,
        # not element-scaled); CPU interpret is exact f32
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 1e-2, rel

    for li in range(2):
        want = split_ref(layers[li])
        check(np.asarray(quantized_matmul(gu, layers[li], impl="pallas",
                                          glu=True), np.float32), want)
        check(np.asarray(quantized_matmul(gu, stacked, glu=True,
                                          impl="pallas",
                                          layer=jnp.int32(li)), np.float32),
              want)
        check(np.asarray(quantized_matmul(gu, layers[li], impl="xla",
                                          glu=True), np.float32), want)


def test_decode_steps_kernel_live_gate_with_dead_slots():
    """In-kernel KV writes with retired (live=0) slots present: the
    dead slots' garbage rows must not land anywhere (their page-table
    rows point at the page-0 scratch AND the live gate blocks the
    write), the live slot decodes identically to a run without dead
    slots, and the interpret-mode DMA race detector sees no cross-slot
    write races on the scratch page."""
    from tgq.models import PRESETS, init_params
    from tgq.serve.decode import decode_steps, prefill_batch, \
        stack_layer_params
    from tgq.serve.kv_cache import PagedKVCache

    cfg = PRESETS["tiny-qwen3-kv128"]
    params = stack_layer_params(init_params(cfg, jax.random.key(0)))
    page, n_pages, mpps = 8, 32, 4

    def run(slots, live):
        cache = PagedKVCache.init(cfg, n_pages, page, kv_bits=8)
        ids = np.zeros((slots, page), np.int32)
        ids[0, :8] = [5, 17, 42, 100, 7, 9, 3, 1]
        slot_pages = np.arange(1, slots + 1, dtype=np.int32).reshape(slots, 1)
        toks, cache, key = prefill_batch(
            params, cache, cfg, jnp.asarray(slot_pages), jnp.asarray(ids),
            jnp.asarray([8] + [1] * (slots - 1), np.int32),
            jnp.zeros((slots,), np.float32), jax.random.key(0))
        table = np.zeros((slots, mpps), np.int32)
        table[0, 0] = 1
        table[0, 1] = slots + 1
        # dead slots keep lens like freshly-retired ones (engine passes
        # pt.lens of 0 -> lens 1) and page-0-clamped table rows
        lens0 = np.asarray([8] + [0] * (slots - 1), np.int32)
        out, cache, _ = decode_steps(
            params, cache, cfg, jnp.asarray(table),
            jnp.asarray(lens0 + 1), toks, jnp.asarray(lens0),
            jnp.zeros((slots,), np.float32), key, 4, "kernel",
            live=jnp.asarray(live, np.int32))
        return np.asarray(out), cache

    out1, cache1 = run(4, [1, 0, 0, 0])
    out2, _ = run(2, [1, 0])
    np.testing.assert_array_equal(out1[:, 0], out2[:, 0])
    # the scratch page took no kernel-path writes at all
    assert np.all(np.asarray(cache1.k[:, 0]) == 0)
    assert np.all(np.asarray(cache1.ks[:, 0]) == 0)
