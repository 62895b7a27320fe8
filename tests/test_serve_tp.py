"""TP-sharded serving on the virtual mesh must reproduce single-device
greedy decoding exactly (modulo f32 reduction order)."""
import numpy as np
import jax
import pytest

from tgq.models import PRESETS, init_params
from tgq.parallel import make_mesh
from tgq.serve import Engine, ServeConfig

CFG = PRESETS["tiny-qwen3"]


def test_tp_serving_matches_single_device(eight_devices):
    # model axis 2: kv_heads=2 shard cleanly
    mesh = make_mesh(data=4, devices=eight_devices)  # (4, 2)
    assert mesh.shape["model"] == 2
    params = init_params(CFG, jax.random.key(0))
    scfg = ServeConfig(max_slots=2, page_size=8, num_pages=64,
                       max_pages_per_slot=8, max_new_tokens=5)

    prompts = [[5, 17, 42, 100], [7, 7, 9]]
    ref_eng = Engine(params, CFG, scfg)
    ref_reqs = [ref_eng.submit(p) for p in prompts]
    ref_eng.run()

    tp_eng = Engine(params, CFG, scfg, mesh=mesh)
    tp_reqs = [tp_eng.submit(p) for p in prompts]
    tp_eng.run()

    for r_ref, r_tp in zip(ref_reqs, tp_reqs):
        assert r_ref.output == r_tp.output, (r_ref.output, r_tp.output)
