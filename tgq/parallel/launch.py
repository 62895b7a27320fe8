"""Multi-host bring-up: jax.distributed + global mesh construction.

On a multi-host TPU slice every host runs the same program; this module
wraps the initialization handshake and builds the global ("data",
"model") mesh spanning all hosts, with the model axis laid out within a
host's chips first so TP collectives ride ICI and only the data axis
crosses DCN (the layout rule from the scaling playbook).

No NCCL/MPI analog exists in this stack: after initialize(), XLA's
runtime owns all transport, and the same jit/pjit programs that run
single-host run globally.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or bootstrap) the multi-host runtime.  On TPU pods with
    standard env configuration all arguments are auto-detected."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    logger.info("[dist] process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def build_device_grid(devices, local: int,
                      model: Optional[int] = None) -> np.ndarray:
    """(data, model) device grid with the model axis intra-host.

    ``devices`` are grouped by process explicitly (sorted by
    (process_index, id) — never rely on jax.devices() ordering), then
    reshaped so each model row is a contiguous run of one host's chips
    (TP rides ICI).  model ≤ local needs local % model == 0; model >
    local (TP spanning hosts, the 70B fallback) needs model % local ==
    0 and keeps whole hosts per row.
    """
    devices = sorted(
        devices,
        key=lambda d: (getattr(d, "process_index", 0), getattr(d, "id", 0)),
    )
    n = len(devices)
    model = model if model is not None else local
    assert n % model == 0, (n, model)
    if model <= local:
        assert local % model == 0, (
            f"model={model} must divide local={local} so no TP group "
            f"straddles hosts")
    else:
        assert model % local == 0, (
            f"model={model} must be a multiple of local={local} so TP "
            f"groups hold whole hosts")
        logger.warning("[mesh] TP degree %d spans %d hosts — the block "
                       "psum crosses DCN", model, model // local)
    return np.asarray(devices, dtype=object).reshape(n // model, model)


def global_mesh(model_per_host: Optional[int] = None) -> Mesh:
    """("data", "model") mesh over all hosts.

    The model axis is filled with each host's local chips first (TP
    inside a host/slice → ICI); the data axis spans hosts (DCN-tolerant
    all-reduce of Gram matrices / batch shards).
    """
    grid = build_device_grid(jax.devices(), jax.local_device_count(),
                             model_per_host)
    return Mesh(grid, ("data", "model"))
