"""Multi-host mesh layout tests (tgq.parallel.launch).

The device-grid rule — model axis intra-host so TP collectives ride
ICI, data axis across hosts on DCN — is the one distributed component a
single-host run never exercises; these tests pin it against mocked
device lists, and test_global_mesh_end_to_end runs a real jit through a
global_mesh on the virtual 8-device CPU backend.
"""
import dataclasses

import numpy as np
import pytest


@dataclasses.dataclass(frozen=True)
class FakeDevice:
    id: int
    process_index: int


def make_pod(hosts: int, local: int, shuffle_seed=None):
    devs = [FakeDevice(id=h * local + i, process_index=h)
            for h in range(hosts) for i in range(local)]
    if shuffle_seed is not None:
        rng = np.random.default_rng(shuffle_seed)
        devs = [devs[i] for i in rng.permutation(len(devs))]
    return devs


def test_grid_model_axis_intra_host():
    """Default layout: each model row is exactly one host's chips."""
    from tgq.parallel.launch import build_device_grid

    grid = build_device_grid(make_pod(4, 8), local=8)
    assert grid.shape == (4, 8)
    for row in grid:
        assert len({d.process_index for d in row}) == 1
    # data axis crosses hosts
    assert len({grid[i, 0].process_index for i in range(4)}) == 4


def test_grid_ignores_input_ordering():
    """jax.devices() ordering must not matter — grouping is explicit."""
    from tgq.parallel.launch import build_device_grid

    grid = build_device_grid(make_pod(2, 4, shuffle_seed=0), local=4)
    assert grid.shape == (2, 4)
    for row in grid:
        assert len({d.process_index for d in row}) == 1
        assert [d.id for d in row] == sorted(d.id for d in row)


def test_grid_sub_host_tp():
    """model < local: several TP groups per host, none straddling."""
    from tgq.parallel.launch import build_device_grid

    grid = build_device_grid(make_pod(2, 4), local=4, model=2)
    assert grid.shape == (4, 2)
    for row in grid:
        assert len({d.process_index for d in row}) == 1


def test_grid_cross_host_tp():
    """model > local (70B fallback): whole hosts per TP group."""
    from tgq.parallel.launch import build_device_grid

    grid = build_device_grid(make_pod(4, 4), local=4, model=8)
    assert grid.shape == (2, 8)
    for row in grid:
        assert len({d.process_index for d in row}) == 2


def test_grid_rejects_straddling():
    from tgq.parallel.launch import build_device_grid

    with pytest.raises(AssertionError):
        build_device_grid(make_pod(2, 4), local=4, model=3)


def test_global_mesh_end_to_end(eight_devices):
    """global_mesh on the virtual 8-device backend: mesh axes correct
    and a sharded computation executes (local_device_count == 8 here,
    so model_per_host picks the sub-host TP layout)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tgq.parallel.launch import global_mesh

    mesh = global_mesh(model_per_host=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}

    x = jnp.arange(32.0).reshape(8, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    y = jax.jit(lambda a: (a * 2).sum())(xs)
    assert float(y) == float((x * 2).sum())
