"""Serving engine tests: paged decode == full forward; continuous
batching lifecycle; quantized serving path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgq.models import PRESETS, forward, init_params
from tgq.serve import Engine, PagedKVCache, PageTable, Request, ServeConfig

CFG = PRESETS["tiny-qwen3"]

# 1-layer geometry for raw cache-format tests (kvh=2, d=16)
from tgq.models.config import ModelConfig  # noqa: E402

CFG_KVQ = ModelConfig(name="kvq-test", vocab_size=8, hidden_size=256,
                      intermediate_size=8, num_layers=1, num_heads=2,
                      num_kv_heads=2, head_dim=128)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.key(0))


def greedy_reference(params, ids, n_new):
    """Full-recompute greedy decode — the correctness oracle."""
    ids = list(ids)
    out = []
    for _ in range(n_new):
        logits = forward(params, CFG, jnp.asarray([ids]), attn_impl="naive")
        tok = int(jnp.argmax(logits[0, len(ids) - 1]))
        out.append(tok)
        ids.append(tok)
    return out


def test_paged_decode_matches_full_forward(params):
    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=64,
                       max_pages_per_slot=8, max_new_tokens=6)
    eng = Engine(params, CFG, scfg)
    prompt = [5, 17, 42, 100, 7]
    req = eng.submit(prompt)
    eng.run()
    ref = greedy_reference(params, prompt, 6)
    assert req.output == ref, (req.output, ref)


def test_continuous_batching_multiple_requests(params):
    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=64,
                       max_pages_per_slot=8, max_new_tokens=4)
    eng = Engine(params, CFG, scfg)
    prompts = [[1, 2, 3], [10, 20, 30, 40, 50], [99, 98], [7] * 9]
    reqs = [eng.submit(p) for p in prompts]
    done = eng.run()
    assert len(done) + sum(r.done for r in reqs if r not in done) >= 4
    for r, p in zip(reqs, prompts):
        assert r.done
        assert len(r.output) == 4
        assert r.output == greedy_reference(params, p, 4), p
    # all pages returned to the pool
    assert eng.pt.num_free == scfg.num_pages - 1  # page 0 reserved


@pytest.mark.parametrize("backend", ["python", "auto"])
def test_page_allocator(backend):
    pt = PageTable(num_pages=16, page_size=4, max_slots=2,
                   max_pages_per_slot=4, backend=backend)
    assert pt.can_alloc(12)
    pages = pt.alloc_slot(0, 10)  # 3 pages
    assert pt.lens[0] == 10
    assert len(pages) == 3 == len(pt.slot_pages(0))
    pt.extend(0, 1)  # 11 tokens still 3 pages
    assert len(pt.slot_pages(0)) == 3
    pt.extend(0, 1)
    pt.extend(0, 1)  # 13 tokens -> 4 pages
    assert len(pt.slot_pages(0)) == 4
    pt.free_slot(0)
    assert pt.num_free == 15


def test_page_allocator_backends_equivalent(rng):
    """Randomized op sequence: native and python backends stay in
    lockstep on every observable."""
    from tgq._native import get_page_alloc_cls

    if get_page_alloc_cls() is None:
        pytest.skip("no C++ toolchain")
    kw = dict(num_pages=32, page_size=4, max_slots=4, max_pages_per_slot=8)
    a = PageTable(backend="python", **kw)
    b = PageTable(backend="native", **kw)
    active: set[int] = set()
    for _ in range(300):
        op = rng.integers(0, 3)
        if op == 0:
            free_slots = [s for s in range(4) if s not in active]
            n = int(rng.integers(1, 20))
            if free_slots and a.can_alloc(n) == b.can_alloc(n) and a.can_alloc(n):
                s = free_slots[0]
                assert a.alloc_slot(s, n) == b.alloc_slot(s, n)
                active.add(s)
        elif op == 1 and active:
            s = sorted(active)[int(rng.integers(0, len(active)))]
            if a.pages_needed(a.lens[s] + 1) <= 8 and a.num_free == b.num_free:
                if a.pages_needed(a.lens[s] + 1) - a.pages_needed(a.lens[s]) <= a.num_free:
                    a.extend(s, 1)
                    b.extend(s, 1)
        elif op == 2 and active:
            s = sorted(active)[int(rng.integers(0, len(active)))]
            if rng.integers(0, 2):
                a.free_slot(s)
                b.free_slot(s)
            else:  # detach/release round-trip (deferred frees)
                pa, pb = a.detach_slot(s), b.detach_slot(s)
                assert pa == pb
                a.release_pages(pa)
                b.release_pages(pb)
            active.discard(s)
        assert a.lens == b.lens
        assert a.num_free == b.num_free
        ta, la = a.device_tables()
        tb, lb = b.device_tables()
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_chunked_decode_matches_stepwise(params):
    """Greedy outputs are bit-identical whether the engine fuses 1 or 8
    decode steps per dispatch (decode_steps scan vs per-token path)."""
    prompt = [5, 17, 42, 100, 7]
    outs = []
    for chunk in (1, 8):
        scfg = ServeConfig(max_slots=2, page_size=8, num_pages=64,
                           max_pages_per_slot=8, max_new_tokens=11,
                           decode_chunk=chunk)
        eng = Engine(params, CFG, scfg)
        req = eng.submit(prompt)
        eng.run()
        outs.append(req.output)
    assert outs[0] == outs[1], outs
    assert outs[0] == greedy_reference(params, prompt, 11)


def test_eos_mid_chunk_truncates(params):
    """An EOS landing inside a fused chunk must end the request there —
    speculative tokens after it are discarded."""
    prompt = [3, 1, 4]
    ref = greedy_reference(params, prompt, 8)
    eos = ref[3]  # hits at step 4 of an 8-step chunk
    scfg = ServeConfig(max_slots=1, page_size=8, num_pages=32,
                       max_pages_per_slot=8, max_new_tokens=8,
                       eos_id=eos, decode_chunk=8)
    eng = Engine(params, CFG, scfg)
    req = eng.submit(prompt)
    eng.run()
    assert req.output == ref[:4], (req.output, ref)


def test_eos_stopping(params):
    # find the greedy first token and use it as "eos"
    prompt = [3, 1, 4]
    first = greedy_reference(params, prompt, 1)[0]
    scfg = ServeConfig(max_slots=1, page_size=8, num_pages=32,
                       max_pages_per_slot=4, max_new_tokens=10, eos_id=first)
    eng = Engine(params, CFG, scfg)
    req = eng.submit(prompt)
    eng.run()
    assert req.output == [first]


def test_kv_int8_roundtrip():
    """int8 per-token-per-head KV storage reconstructs within absmax
    quantization error (≤ scale/2 per element ⇒ rel err ~0.4%)."""
    from tgq.serve.kv_cache import (PagedKVCache, kv_gather, kv_write_pages,
                                    scale_pad)

    rng = np.random.default_rng(0)
    page, kvh, d, n_pages, layers = 8, 2, 16, 4, 2
    cache = PagedKVCache(
        k=jnp.zeros((layers, n_pages + 1, page, kvh * d), jnp.int8),
        v=jnp.zeros((layers, n_pages + 1, page, kvh * d), jnp.int8),
        ks=jnp.zeros((layers, n_pages + 1, kvh, scale_pad(page)), jnp.float32),
        vs=jnp.zeros((layers, n_pages + 1, kvh, scale_pad(page)), jnp.float32),
        num_kv_heads=kvh,
    )
    k_new = jnp.asarray(rng.standard_normal((n_pages * page, kvh, d)),
                        jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((n_pages * page, kvh, d)),
                        jnp.float32)
    cache = kv_write_pages(cache, 1, jnp.arange(1, n_pages + 1), k_new, v_new)
    table = jnp.arange(1, n_pages + 1)[None, :]  # one slot, all pages
    # f32 gather isolates the int8 storage error (serving gathers bf16)
    kg, vg = kv_gather(cache, 1, table, dtype=jnp.float32)
    for got, want in ((kg, k_new), (vg, v_new)):
        err = np.abs(np.asarray(got[0]) - np.asarray(want))
        amax = np.max(np.abs(np.asarray(want)), axis=-1, keepdims=True)
        assert np.all(err <= amax / 127.0 * 0.5 + 1e-6)


def test_kv8_serving_matches_greedy(params):
    """INT8 KV cache keeps tiny-model greedy decode identical to bf16."""
    prompt = [5, 17, 42, 100, 7]
    ref = greedy_reference(params, prompt, 6)
    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=64,
                       max_pages_per_slot=8, max_new_tokens=6, kv_bits=8)
    eng = Engine(params, CFG, scfg)
    req = eng.submit(prompt)
    eng.run()
    assert req.output == ref, (req.output, ref)


def test_quantized_serving(params):
    """Packed-INT8 weights served through the engine stay close to the
    dense greedy path."""
    import copy

    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
    from tgq.models.causal_lm import get_nested, set_nested, find_linear_paths

    qparams = copy.deepcopy(params)
    spec = QuantSpec(bits=8, group_size=32, sym=False)
    for li, lp in enumerate(qparams["model"]["layers"]):
        for name in find_linear_paths(CFG):
            w = get_nested(lp, name)["w"].astype(jnp.float32)
            p = find_params(w, spec)
            s, z = expand_params(p, w.shape[1])
            q = quantize(w, s, z, spec).astype(jnp.int32)
            set_nested(lp, name, PackedLinear.from_codes(q, p.scale, p.zero, spec))

    scfg = ServeConfig(max_slots=1, page_size=8, num_pages=32,
                       max_pages_per_slot=8, max_new_tokens=4)
    eng = Engine(qparams, CFG, scfg)
    prompt = [5, 17, 42]
    req = eng.submit(prompt)
    eng.run()
    assert len(req.output) == 4
    # int8 is near-lossless on this tiny model: same greedy tokens
    assert req.output == greedy_reference(params, prompt, 4)


def test_fused_projections_match_unfused(params):
    """Engine with fused qkv/gate_up packed projections (the mesh=None
    default) decodes the same tokens as the unfused per-layer path."""
    import copy

    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
    from tgq.models.causal_lm import get_nested, set_nested, find_linear_paths

    qparams = copy.deepcopy(params)
    spec = QuantSpec(bits=8, group_size=32, sym=False)
    for lp in qparams["model"]["layers"]:
        for name in find_linear_paths(CFG):
            w = get_nested(lp, name)["w"].astype(jnp.float32)
            p = find_params(w, spec)
            s, z = expand_params(p, w.shape[1])
            q = quantize(w, s, z, spec).astype(jnp.int32)
            set_nested(lp, name, PackedLinear.from_codes(q, p.scale, p.zero, spec))

    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=32,
                       max_pages_per_slot=8, max_new_tokens=6)
    prompt = [5, 17, 42, 3]
    fused_eng = Engine(copy.deepcopy(qparams), CFG, scfg)  # fuses by default
    stacked = fused_eng.params["model"]["layers"]
    assert any("qkv_proj" in str(k) for k in stacked["self_attn"].keys())
    rf = fused_eng.submit(prompt)
    fused_eng.run()

    plain_eng = Engine(qparams, CFG, scfg, stack_layers=False)  # unfused
    rp = plain_eng.submit(prompt)
    plain_eng.run()
    assert rf.output == rp.output


def test_kv_write_token_all_matches_per_layer():
    """One batched all-layer scatter == 36 per-layer kv_write_token calls
    (bf16 and int8 storage)."""
    from tgq.serve.kv_cache import kv_write_token, kv_write_token_all

    rng = np.random.default_rng(0)
    L, slots, kvh, d = 3, 4, 2, 8
    for kv_bits in (16, 8):
        cache_a = PagedKVCache.init(CFG, num_pages=8, page_size=4,
                                    kv_bits=kv_bits)
        cache_b = PagedKVCache.init(CFG, num_pages=8, page_size=4,
                                    kv_bits=kv_bits)
        # CFG is tiny-qwen3; rebuild shapes from its config
        Lc = CFG.num_layers
        kvh_c, d_c = CFG.num_kv_heads, CFG.head_dim
        pages = jnp.asarray(rng.integers(0, 8, (slots,)), jnp.int32)
        # distinct (page, offset) pairs to avoid scatter-order ambiguity
        pages = jnp.asarray([1, 2, 3, 1], jnp.int32)
        offs = jnp.asarray([0, 0, 2, 3], jnp.int32)
        k_all = jnp.asarray(
            rng.standard_normal((Lc, slots, kvh_c, d_c)), jnp.float32)
        v_all = jnp.asarray(
            rng.standard_normal((Lc, slots, kvh_c, d_c)), jnp.float32)
        for li in range(Lc):
            cache_a = kv_write_token(cache_a, li, pages, offs,
                                     k_all[li], v_all[li])
        cache_b = kv_write_token_all(cache_b, pages, offs, k_all, v_all)
        np.testing.assert_array_equal(np.asarray(cache_a.k),
                                      np.asarray(cache_b.k))
        np.testing.assert_array_equal(np.asarray(cache_a.v),
                                      np.asarray(cache_b.v))
        if kv_bits == 8:
            np.testing.assert_array_equal(np.asarray(cache_a.ks),
                                          np.asarray(cache_b.ks))
            np.testing.assert_array_equal(np.asarray(cache_a.vs),
                                          np.asarray(cache_b.vs))


def test_packed_bias_serving_matches_dense():
    """Qwen2-style qkv biases survive packing (PackedLinear.bias),
    projection fusion (concat_out), and the serving engine."""
    import copy

    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
    from tgq.models import PRESETS, init_params
    from tgq.models.causal_lm import get_nested, set_nested, find_linear_paths

    cfg2 = PRESETS["tiny-qwen2"]
    assert cfg2.attention_bias
    params = init_params(cfg2, jax.random.key(7))
    # non-trivial biases so dropping them would change greedy tokens
    key = jax.random.key(11)
    for lp in params["model"]["layers"]:
        for name in ("q_proj", "k_proj", "v_proj"):
            p = lp["self_attn"][name]
            key, sub = jax.random.split(key)
            p["b"] = jax.random.normal(sub, p["b"].shape, p["b"].dtype) * 0.5

    ref = greedy_reference_cfg(params, cfg2, [5, 17, 42], 5)

    qparams = copy.deepcopy(params)
    spec = QuantSpec(bits=8, group_size=32, sym=False)
    for lp in qparams["model"]["layers"]:
        for name in find_linear_paths(cfg2):
            entry = get_nested(lp, name)
            w = entry["w"].astype(jnp.float32)
            p = find_params(w, spec)
            s, z = expand_params(p, w.shape[1])
            q = quantize(w, s, z, spec).astype(jnp.int32)
            set_nested(lp, name, PackedLinear.from_codes(
                q, p.scale, p.zero, spec,
                bias=entry.get("b")))

    scfg = ServeConfig(max_slots=1, page_size=8, num_pages=32,
                       max_pages_per_slot=8, max_new_tokens=5)
    eng = Engine(qparams, cfg2, scfg)
    req = eng.submit([5, 17, 42])
    eng.run()
    assert req.output == ref, (req.output, ref)


def greedy_reference_cfg(params, cfg, ids, n_new):
    ids = list(ids)
    out = []
    for _ in range(n_new):
        logits = forward(params, cfg, jnp.asarray([ids]), attn_impl="naive")
        tok = int(jnp.argmax(logits[0, len(ids) - 1]))
        out.append(tok)
        ids.append(tok)
    return out


def test_overlap_host_dispatch_token_identical(params):
    """Pipelined decode (speculative chunk N+1 dispatch from the device
    token carry) emits exactly the same tokens as synchronous ticks,
    across mixed generation lengths and mid-stream admissions."""
    import copy

    prompts = [[5, 17, 42], [7, 9], [3, 1, 4, 1, 5], [2, 6]]
    budgets = [6, 3, 9, 5]

    def run(overlap):
        scfg = ServeConfig(max_slots=2, page_size=8, num_pages=64,
                           max_pages_per_slot=8, decode_chunk=4,
                           overlap_host=overlap)
        eng = Engine(copy.deepcopy(params), CFG, scfg)
        reqs = [eng.submit(p, max_new_tokens=b)
                for p, b in zip(prompts, budgets)]
        eng.run()
        return [r.output for r in reqs]

    assert run(True) == run(False)


def test_overlap_host_eos_mid_chunk_token_identical(params):
    """EOS-safe speculative pipelining: with ``eos_id`` set and an EOS
    landing mid-chunk, the pipelined engine still matches synchronous
    ticks token-for-token, and retired slots' pages stay out of the
    free pool until the in-flight chunk completes (the tiny page pool
    forces the next admission to want exactly those pages)."""
    import copy

    prompts = [[5, 17, 42], [7, 9], [3, 1, 4, 1, 5], [2, 6], [11, 13]]
    budgets = [7, 9, 8, 6, 7]

    # discover a token the model emits mid-stream, to use as EOS
    probe_cfg = ServeConfig(max_slots=2, page_size=8, num_pages=64,
                            max_pages_per_slot=8, decode_chunk=4,
                            overlap_host=False)
    probe = Engine(copy.deepcopy(params), CFG, probe_cfg)
    preqs = [probe.submit(p, max_new_tokens=b)
             for p, b in zip(prompts, budgets)]
    probe.run()
    eos = None
    for r in preqs:
        for i, t in enumerate(r.output):
            if i >= 1:  # mid-chunk: not the prefill token
                eos = int(t)
                break
        if eos is not None:
            break
    assert eos is not None

    def run(overlap):
        # pool barely larger than 2 active slots' worth: a retirement's
        # pages are needed by the next admission almost immediately
        scfg = ServeConfig(max_slots=2, page_size=8, num_pages=8,
                           max_pages_per_slot=3, decode_chunk=4,
                           overlap_host=overlap, eos_id=eos)
        eng = Engine(copy.deepcopy(params), CFG, scfg)
        reqs = [eng.submit(p, max_new_tokens=b)
                for p, b in zip(prompts, budgets)]
        eng.run()
        assert eng.pt.num_free == scfg.num_pages - 1  # all pages returned
        return [r.output for r in reqs]

    with_overlap = run(True)
    assert with_overlap == run(False)
    # the EOS really truncated some request mid-stream
    assert any(out and out[-1] == eos and len(out) < b
               for out, b in zip(with_overlap, budgets))


def test_kv_int4_roundtrip():
    """INT4 nibble-packed KV: token + page writes reconstruct through
    kv_gather within absmax/7 quantization error."""
    from tgq.serve.kv_cache import (PagedKVCache, kv_gather, kv_write_pages,
                                    kv_write_token)

    rng = np.random.default_rng(3)
    cache = PagedKVCache.init(CFG, num_pages=8, page_size=4, kv_bits=4)
    assert cache.kv_bits == 4 and cache.k.dtype == jnp.uint8
    kvh, d = CFG.num_kv_heads, CFG.head_dim
    assert cache.head_dim == d

    # page write (prefill): 1 slot, 2 pages = 8 tokens
    seq = 8
    k_new = jnp.asarray(rng.standard_normal((seq, kvh, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((seq, kvh, d)), jnp.float32)
    cache = kv_write_pages(cache, 0, jnp.asarray([1, 2]), k_new, v_new)
    # token write on top (slot at page 3, offset 1)
    kt = jnp.asarray(rng.standard_normal((1, kvh, d)), jnp.float32)
    vt = jnp.asarray(rng.standard_normal((1, kvh, d)), jnp.float32)
    cache = kv_write_token(cache, 0, jnp.asarray([3]), jnp.asarray([1]),
                           kt, vt)

    table = jnp.asarray([[1, 2, 3]], jnp.int32)
    kg, vg = kv_gather(cache, 0, table, dtype=jnp.float32)
    got_k = np.asarray(kg[0, :seq])
    rel = np.linalg.norm(got_k - np.asarray(k_new)) / np.linalg.norm(k_new)
    assert rel < 0.12, rel   # absmax/7 on d=16 gaussian rows ~ 0.09 rel
    got_t = np.asarray(kg[0, 2 * 4 + 1])
    relt = np.linalg.norm(got_t - np.asarray(kt[0])) / np.linalg.norm(kt)
    assert relt < 0.12, relt
    got_v = np.asarray(vg[0, :seq])
    relv = np.linalg.norm(got_v - np.asarray(v_new)) / np.linalg.norm(v_new)
    assert relv < 0.12, relv


def test_kv_equalizers_identity_and_gain():
    """eq=ones is bit-identical to no-eq storage; a true channel profile
    cuts gather reconstruction error on channel-outlier data."""
    from tgq.serve.kv_cache import PagedKVCache, kv_gather, kv_write_pages

    rng = np.random.default_rng(7)
    kvh, d, page, n_pages = 2, 128, 8, 4
    fused = kvh * d
    amp = np.exp(rng.normal(0, 1.0, fused)).astype(np.float32)
    amp[rng.choice(fused, 4, replace=False)] *= 8.0  # hard outlier channels
    k_new = jnp.asarray((rng.standard_normal((n_pages * page, fused))
                         * amp).reshape(-1, kvh, d), jnp.float32)
    v_new = k_new[::-1]
    pages = jnp.arange(1, n_pages + 1)

    def gather_err(**kw):
        cache = PagedKVCache.init(CFG_KVQ, n_pages + 1, page, kv_bits=8, **kw)
        cache = kv_write_pages(cache, 0, pages, k_new, v_new)
        kg, _ = kv_gather(cache, 0, pages[None], dtype=jnp.float32)
        got = np.asarray(kg[0])
        want = np.asarray(k_new)
        return got, np.linalg.norm(got - want) / np.linalg.norm(want)

    ones = np.ones((1, fused), np.float32)
    got_none, err_none = gather_err()
    got_ones, err_ones = gather_err(k_eq=ones, v_eq=ones)
    np.testing.assert_array_equal(got_none, got_ones)  # exact identity

    eq = (amp.reshape(kvh, d) / amp.reshape(kvh, d).mean(-1, keepdims=True)
          ).reshape(1, fused)
    _, err_eq = gather_err(k_eq=eq, v_eq=eq)
    assert err_eq < err_none * 0.5, (err_eq, err_none)


def test_kv_equalizer_serving_matches_greedy(params):
    """int8 KV + estimated equalizers on the tiny model still decodes
    greedy-identically (quantization margins dwarf the model's gaps),
    through prefill, chunked decode, and the deferred write path."""
    from tgq.serve.kv_calibrate import estimate_kv_equalizers

    calib = jnp.asarray([[5, 17, 42, 100, 7, 9, 3, 1] * 4])
    k_eq, v_eq = estimate_kv_equalizers(params, CFG, calib,
                                        attn_impl="naive")
    assert k_eq.shape == (CFG.num_layers, CFG.num_kv_heads * CFG.head_dim)
    assert np.all(k_eq > 0) and np.all(v_eq > 0)

    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=32,
                       max_pages_per_slot=8, max_new_tokens=6, kv_bits=8,
                       kv_k_eq=k_eq, kv_v_eq=v_eq, decode_chunk=4)
    eng = Engine(params, CFG, scfg)
    prompt = [5, 17, 42]
    req = eng.submit(prompt)
    eng.run()
    assert req.output == greedy_reference(params, prompt, 6)


def test_kv4_serving_runs_and_tracks_greedy(params):
    """INT4 KV serving on the tiny model: decodes to completion and
    stays close to the bf16 greedy path (identical here — the tiny
    model's margins dwarf absmax/7 KV noise)."""
    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=32,
                       max_pages_per_slot=8, max_new_tokens=5, kv_bits=4)
    eng = Engine(params, CFG, scfg)
    prompt = [5, 17, 42]
    req = eng.submit(prompt)
    eng.run()
    assert len(req.output) == 5
    assert req.output == greedy_reference(params, prompt, 5)


def test_checkpoint_kv_equalizer_roundtrip(tmp_path, params):
    """save_quantized(kv_equalizers=...) -> load_quantized returns the
    profiles bit-exactly, and a plain checkpoint returns none."""
    from tgq.core.checkpoint import load_quantized, save_quantized

    k_eq = np.random.default_rng(1).random(
        (CFG.num_layers, CFG.num_kv_heads * CFG.head_dim)).astype(np.float32)
    v_eq = k_eq * 2.0
    path = str(tmp_path / "ck")
    save_quantized(path, params, {}, CFG, {"w_bits": 4},
                   kv_equalizers=(k_eq, v_eq))
    _, _, qconf = load_quantized(path)
    got_k, got_v = qconf["kv_equalizers"]
    np.testing.assert_array_equal(got_k, k_eq)
    np.testing.assert_array_equal(got_v, v_eq)

    path2 = str(tmp_path / "ck2")
    save_quantized(path2, params, {}, CFG, {"w_bits": 4})
    _, _, qconf2 = load_quantized(path2)
    assert "kv_equalizers" not in qconf2


@pytest.mark.parametrize("bits", [3, 2])
def test_sub_nibble_packed_serving(bits):
    """INT3/INT2 packed weights through the full engine: decode is
    deterministic and matches a dense engine built from the same
    dequantized weights (the packed matmul computes x@dequantize().T in
    f32 on the XLA path, so a dense f32-weight engine is bit-identical
    on CPU)."""
    import copy

    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
    from tgq.models import PRESETS, init_params
    from tgq.models.causal_lm import get_nested, set_nested, find_linear_paths

    cfg = PRESETS["tiny-qwen3"]
    params = init_params(cfg, jax.random.key(21))
    spec = QuantSpec(bits=bits, group_size=32, sym=False)
    qparams = copy.deepcopy(params)
    dparams = copy.deepcopy(params)
    for lp_q, lp_d in zip(qparams["model"]["layers"],
                          dparams["model"]["layers"]):
        for name in find_linear_paths(cfg):
            w = get_nested(lp_q, name)["w"].astype(jnp.float32)
            p = find_params(w, spec)
            s, z = expand_params(p, w.shape[1])
            q = quantize(w, s, z, spec).astype(jnp.int32)
            pl = PackedLinear.from_codes(q, p.scale, p.zero, spec)
            set_nested(lp_q, name, pl)
            set_nested(lp_d, name, {"w": pl.dequantize(jnp.float32)})

    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=32,
                       max_pages_per_slot=8, max_new_tokens=5)
    prompts = [[5, 17, 42], [7, 9, 3, 1]]

    eng_q = Engine(qparams, cfg, scfg)
    reqs_q = [eng_q.submit(p) for p in prompts]
    eng_q.run()
    eng_d = Engine(dparams, cfg, scfg)
    reqs_d = [eng_d.submit(p) for p in prompts]
    eng_d.run()
    for rq, rd in zip(reqs_q, reqs_d):
        assert len(rq.output) == 5
        assert rq.output == rd.output, (bits, rq.output, rd.output)


def test_engine_a8_runs_and_tracks_a16():
    """ServeConfig(a_bits=8): W4A8 activations through the packed
    matmuls (simulated on CPU by the XLA fallback's fake-quant — same
    semantics as the int8-MXU kernel, which is oracle-exact in
    tests/test_dequant_matmul.py).  Greedy outputs are finite, in-vocab,
    and mostly agree with A16 on a tiny model."""
    import dataclasses

    from tgq.core.quant import QuantSpec
    from tgq.models.config import PRESETS
    from tgq.models.hf_import import init_packed_params
    from tgq.serve import Engine, ServeConfig

    cfg = PRESETS["tiny-qwen3"]
    spec = QuantSpec(bits=4, group_size=32, sym=False)
    params = init_packed_params(cfg, spec, seed=0)
    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=32,
                       max_pages_per_slot=4, max_new_tokens=6,
                       decode_chunk=2, kv_bits=8)
    prompts = [[5, 17, 42], [7, 9, 3, 1]]

    ref_eng = Engine(params, cfg, scfg)
    ref = [ref_eng.submit(p) for p in prompts]
    ref_eng.run()

    scfg8 = dataclasses.replace(scfg, a_bits=8)
    eng8 = Engine(params, cfg, scfg8)
    out8 = [eng8.submit(p) for p in prompts]
    eng8.run()

    agree = total = 0
    for r, t in zip(ref, out8):
        assert len(t.output) == len(r.output)
        assert all(0 <= tok < cfg.vocab_size for tok in t.output)
        agree += sum(a == b for a, b in zip(r.output, t.output))
        total += len(r.output)
    # A8 perturbs logits slightly; on flat random-model logits some
    # greedy flips are expected, wholesale divergence is not
    assert agree >= total // 2, (agree, total)


def test_segmented_nibble_pack_roundtrip():
    """kv_cache int4 packing with pack_segments: per-segment split-half
    is exact, reconstructs natural feature order, and a byte-axis
    shard slice of a segments==tp packed row IS the tp-th segment's
    own contiguous features (the property the TP kernel relies on)."""
    import numpy as np
    import jax.numpy as jnp

    from tgq.serve.kv_cache import _absmax_quantize4, kv_unpack4

    rng = np.random.default_rng(0)
    kvh, d = 4, 32
    x = jnp.asarray(rng.standard_normal((3, 5, kvh, d)).astype(np.float32))
    for seg in (1, 2, 4):
        q, s = _absmax_quantize4(x, segments=seg)
        assert q.shape == (3, 5, kvh * d // 2)
        out = kv_unpack4(q, jnp.float32, segments=seg)
        ref = jnp.round(jnp.clip(
            x / s[..., None], -7, 7)).reshape(3, 5, -1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # shard slice property: slice of the byte axis for shard t is
        # segment t, which unpacks standalone with segments=1
        B = q.shape[-1] // seg
        F = kvh * d // seg
        for t in range(seg):
            local = kv_unpack4(q[..., t * B:(t + 1) * B], jnp.float32)
            np.testing.assert_array_equal(
                np.asarray(local),
                np.asarray(ref[..., t * F:(t + 1) * F]))


def test_engine_step_mid_flight_submit(params):
    """The incremental step() API (r4 VERDICT directive #5): a request
    submitted WHILE an earlier one is mid-decode is admitted on a later
    tick, gets its TTFT stamped after its submit time, and its tokens
    are identical to a fresh-queue run (greedy decode has no cross-slot
    ops, so batch composition cannot change a slot's outputs)."""
    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=64,
                       max_pages_per_slot=8, max_new_tokens=6,
                       decode_chunk=2)
    p1, p2 = [5, 17, 42, 100, 7], [9, 3, 3, 21]

    ref_eng = Engine(params, CFG, scfg)
    r1_ref = ref_eng.submit(p1)
    r2_ref = ref_eng.submit(p2)
    ref_eng.run()

    eng = Engine(params, CFG, scfg)
    r1 = eng.submit(p1)
    # drive until r1 is genuinely mid-flight (has emitted tokens but
    # isn't done), then submit r2 between ticks
    for _ in range(100):
        eng.step()
        if len(r1.output) >= 1 and not r1.done:
            break
    assert r1.output and not r1.done, (r1.output, r1.done)
    r2 = eng.submit(p2)
    for _ in range(200):
        if eng.idle:
            break
        eng.step()
    assert eng.idle
    assert r1.done and r2.done
    assert r1.output == r1_ref.output, (r1.output, r1_ref.output)
    assert r2.output == r2_ref.output, (r2.output, r2_ref.output)
    # late request's TTFT is measured from ITS submit time
    assert r2.first_token_t >= r2.submit_t > 0
    assert r2.first_token_t >= r1.first_token_t
