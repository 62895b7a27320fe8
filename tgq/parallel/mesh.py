"""Device mesh construction and tensor-parallel sharding rules.

The reference has **zero** distributed code (SURVEY.md §2.5); this layer
is new, built the TPU way: one global ``jax.sharding.Mesh`` with axes
``("data", "model")``, Megatron-style TP expressed as ``PartitionSpec``s
on the parameter tree, and XLA/GSPMD inserting the collectives (a single
psum per block boundary, riding ICI).  Multi-host extends the same mesh
via ``jax.distributed.initialize`` — no NCCL/MPI analog exists or is
needed; the XLA runtime owns transport.

TP layout (per decoder layer):
- q/k/v_proj, gate/up_proj: column-sharded (out-dim) → P("model", None)
- o_proj, down_proj:        row-sharded (in-dim)   → P(None, "model")
- norms replicated; embed/lm_head vocab-sharded on "model".

Data parallelism: batch dim of activations on "data"; the per-layer-group
Hessian is a Gram matrix, so DP accumulation is one exact psum
(``dp_hessian_gram``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tgq.core.packing import PackedLinear
from tgq.models.config import ModelConfig


def make_mesh(data: int = 1, model: Optional[int] = None,
              devices=None) -> Mesh:
    """Global 2-axis mesh.  ``model`` defaults to (n_devices / data)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model is None:
        assert n % data == 0, (n, data)
        model = n // data
    assert data * model == n, (data, model, n)
    dev_mesh = mesh_utils.create_device_mesh((data, model), devices=np.asarray(devices))
    return Mesh(dev_mesh, ("data", "model"))


# --------------------------------------------------------- sharding rules

_COL_SHARDED = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW_SHARDED = ("o_proj", "down_proj")


def _linear_spec(name: str, for_bias: bool = False) -> P:
    if name in _COL_SHARDED:
        return P("model") if for_bias else P("model", None)
    if name in _ROW_SHARDED:
        return P() if for_bias else P(None, "model")
    return P()


def _spec_for_path(path: tuple) -> P:
    """PartitionSpec for one leaf, keyed by its param-tree path."""
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    keys = [k for k in keys if k is not None]
    if "embed_tokens" in keys:
        return P("model", None)          # vocab-sharded
    if "lm_head" in keys:
        if keys[-1] in ("codes", "scale", "zero"):
            # packed head is K-major (in/groups, vocab): vocab on model
            return P(None, "model")
        if keys[-1] == "bias":
            return P("model")
        return P("model", None)
    for i, k in enumerate(keys):
        if k.endswith("_proj"):
            if keys[-1] == "b" or keys[-1] == "bias":
                # dense bias "b" / PackedLinear dense bias: 1-D (out,)
                return _linear_spec(k, for_bias=True)
            spec = _linear_spec(k)
            if keys[-1] in ("codes", "scale", "zero"):
                # PackedLinear leaves are K-major (in/groups, out):
                # transpose the dense (out, in) spec
                return P(spec[1], spec[0])
            return spec
    return P()  # norms and everything else replicated


def param_sharding_rules(params) -> dict:
    """Pytree of PartitionSpec congruent with the param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_path(path), params
    )


def shard_params(params, mesh: Mesh):
    """Place a (host) param tree onto the mesh with TP sharding.

    Stacked-layer trees (leaves with a leading layer axis, see
    tgq.serve.decode.stack_layer_params) get a None prepended to each
    spec so the layer axis stays unsharded.
    """
    specs = param_sharding_rules(params)

    def put(leaf, spec):
        if hasattr(leaf, "ndim") and leaf.ndim > len(spec) and any(
            s is not None for s in spec
        ):
            spec = P(*([None] * (leaf.ndim - len(spec))), *spec)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, params, specs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim data parallelism for (batch, seq[, ...]) arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ------------------------------------------------- data-parallel Hessian


def dp_hessian_gram(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Exact data-parallel Gram accumulation: every shard computes its
    local XᵀX on the MXU, one psum over "data" combines them (Gram
    matrices are additive over samples — no approximation)."""
    in_spec = P("data", None)
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(in_spec,), out_specs=P(),
    )
    def local_gram(xs):
        g = jax.lax.dot_general(
            xs, xs, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return jax.lax.psum(g, "data")

    return local_gram(x2)


# --------------------------------------- TP-routed packed matmul (serving)

# The serving mesh for the dispatch currently being traced.  A
# pallas_call inside pjit cannot be auto-partitioned by GSPMD, so
# apply_linear consults this to route PackedLinear matmuls through the
# shard_map wrapper below (each shard runs the fused kernel locally).
#
# A ContextVar, not a module global: two engines (or an engine + a
# calibration run) in one process — even on different threads — each see
# only the mesh their own dispatch scoped.  The jitted serve entry
# points additionally take the mesh as a *static* argument so the jit
# cache distinguishes mesh/non-mesh traces of structurally identical
# params (round-1 ADVICE: cache-key aliasing).
import contextvars as _contextvars

_SERVING_MESH: _contextvars.ContextVar[Optional[Mesh]] = (
    _contextvars.ContextVar("tgq_serving_mesh", default=None))


def set_serving_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Set the serving mesh; returns the previous value (for restore)."""
    prev = _SERVING_MESH.get()
    _SERVING_MESH.set(mesh)
    return prev


def serving_mesh() -> Optional[Mesh]:
    return _SERVING_MESH.get()


def serving_mesh_scope(mesh: Optional[Mesh]):
    """Context manager scoping the serving mesh for one trace/dispatch."""
    from contextlib import contextmanager

    @contextmanager
    def ctx():
        prev = set_serving_mesh(mesh)
        try:
            yield
        finally:
            set_serving_mesh(prev)

    return ctx()


def mark_tp_kinds(params):
    """Tag each packed projection with its TP role ("col"/"row") so
    apply_linear can route it through quantized_matmul_tp.  Walks by
    name (the same names the PartitionSpec rules shard); dense linears
    and fused projections are untouched."""
    import dataclasses as _dc

    def walk(node, name=None):
        if isinstance(node, PackedLinear):
            if name in _COL_SHARDED:
                return _dc.replace(node, tp_kind="col")
            if name in _ROW_SHARDED:
                return _dc.replace(node, tp_kind="row")
            return node
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(params)


def _pad_spec(ndim: int, last: tuple) -> P:
    """PartitionSpec for an ndim-rank leaf whose trailing dims get
    ``last`` (leading stacked-layer dims stay unsharded)."""
    return P(*([None] * (ndim - len(last))), *last)


def quantized_matmul_tp(x: jax.Array, w: PackedLinear, mesh: Mesh,
                        layer=None) -> jax.Array:
    """shard_map'd fused dequant-matmul for TP-sharded PackedLinear.

    col ("model" on out): x replicated, each shard computes its output
    columns with the local kernel — no collective.
    row ("model" on in):  x sharded on its contraction dim, local
    kernel produces partial sums, one psum over "model" — the Megatron
    block-boundary reduction.  A row bias is added once, after the psum.
    """
    import dataclasses as _dc

    from tgq.kernels.dequant_matmul import quantized_matmul

    col = w.tp_kind == "col"
    tp = mesh.shape["model"]
    wl = _dc.replace(w, tp_kind=None,
                     bias=None if (not col) else w.bias)
    if tp == 1:
        y = quantized_matmul(x, wl, layer=layer)
        if not col and w.bias is not None:
            b = w.bias if w.bias.ndim == 1 else w.bias[layer]
            y = y + b.astype(y.dtype)
        return y

    wk = (None, "model") if col else ("model", None)
    w_specs = _dc.replace(
        wl,
        codes=_pad_spec(wl.codes.ndim, wk),
        scale=_pad_spec(wl.scale.ndim, wk),
        zero=_pad_spec(wl.zero.ndim, wk),
        bias=(None if wl.bias is None
              else _pad_spec(wl.bias.ndim, ("model",))),
    )
    x_spec = (_pad_spec(x.ndim, (None,)) if col
              else _pad_spec(x.ndim, ("model",)))
    out_spec = (_pad_spec(x.ndim, ("model",)) if col
                else _pad_spec(x.ndim, (None,)))
    lyr = None if layer is None else jnp.asarray(layer, jnp.int32)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(x_spec, w_specs, None if lyr is None else P()),
             out_specs=out_spec)
    def f(xs, ws, li):
        # relabel static dims to the shard-local geometry
        n_loc = ws.codes.shape[-2] * 8 // ws.bits
        m_loc = ws.codes.shape[-1]
        ws = _dc.replace(ws, in_features=n_loc, out_features=m_loc)
        y = quantized_matmul(xs, ws, layer=li)
        if not col:
            y = jax.lax.psum(y, "model")
        return y

    y = f(x, wl, lyr)
    if not col and w.bias is not None:
        b = w.bias if w.bias.ndim == 1 else w.bias[layer]
        y = y + b.astype(y.dtype)
    return y
