"""Mesh/TP/DP tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tgq.models import PRESETS, forward, init_params
from tgq.parallel import (
    batch_sharding,
    dp_hessian_gram,
    make_mesh,
    param_sharding_rules,
    shard_params,
)

CFG = PRESETS["tiny-qwen3"]


def test_make_mesh(eight_devices):
    mesh = make_mesh(data=2, devices=eight_devices)
    assert mesh.shape == {"data": 2, "model": 4}


def test_sharding_rules_shapes(eight_devices):
    params = init_params(CFG, jax.random.key(0))
    specs = param_sharding_rules(params)
    lp = specs["model"]["layers"][0]
    assert lp["self_attn"]["q_proj"]["w"] == P("model", None)
    assert lp["self_attn"]["o_proj"]["w"] == P(None, "model")
    assert lp["mlp"]["gate_proj"]["w"] == P("model", None)
    assert lp["mlp"]["down_proj"]["w"] == P(None, "model")
    assert lp["input_layernorm"]["weight"] == P()
    assert specs["model"]["embed_tokens"]["weight"] == P("model", None)


def test_tp_forward_matches_single_device(eight_devices):
    """TP+DP sharded forward must be numerically identical (up to fp
    reduction order) to the unsharded forward."""
    mesh = make_mesh(data=2, devices=eight_devices)
    params = init_params(CFG, jax.random.key(1))
    ids = jax.random.randint(jax.random.key(2), (4, 32), 0, CFG.vocab_size)

    ref = forward(params, CFG, ids, attn_impl="naive")

    sharded = shard_params(params, mesh)
    ids_sharded = jax.device_put(ids, batch_sharding(mesh))
    f = jax.jit(lambda p, i: forward(p, CFG, i, attn_impl="naive"))
    out = f(sharded, ids_sharded)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=2e-2, atol=2e-2
    )


def test_dp_hessian_exact(eight_devices):
    mesh = make_mesh(data=8, model=1, devices=eight_devices)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 32)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", None)))
    h = dp_hessian_gram(xs, mesh)
    np.testing.assert_allclose(
        np.asarray(h), x.T @ x, rtol=1e-5, atol=1e-4
    )


def test_sharding_specs_for_packed_bias_and_head():
    """PackedLinear bias leaves get the 1-D out spec; a packed lm_head
    keeps vocab (not the contraction dim) on the model axis."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec
    from tgq.parallel import param_sharding_rules

    spec = QuantSpec(bits=8, group_size=32, sym=False)
    q = jnp.zeros((16, 64), jnp.int32)
    sc = jnp.ones((16, 2), jnp.float32).T * 0 + 1
    pl = PackedLinear.from_codes(q, jnp.ones((16, 2)), jnp.zeros((16, 2)),
                                 spec, bias=jnp.zeros((16,)))
    params = {
        "model": {"layers": [{"self_attn": {"q_proj": pl, "o_proj": pl}}]},
        "lm_head": pl,
    }
    rules = jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf, param_sharding_rules(params))
    qp = params["model"]["layers"][0]["self_attn"]
    rq = param_sharding_rules(params)
    lq = rq["model"]["layers"][0]["self_attn"]["q_proj"]
    lo = rq["model"]["layers"][0]["self_attn"]["o_proj"]
    lh = rq["lm_head"]
    assert lq.codes == P(None, "model")      # col: out on model
    assert lq.bias == P("model")             # 1-D out spec, not rank-2
    assert lo.codes == P("model", None)      # row: in on model
    assert lo.bias == P()                    # row bias replicated
    assert lh.codes == P(None, "model")      # vocab on model (K-major)
    assert lh.bias == P("model")
