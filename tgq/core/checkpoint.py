"""Packed-INT checkpoint format (save/load/restore-for-serving).

The reference saves *dequantized fp16* via HF save_pretrained and leaves
packed storage as a roadmap item (reference quantize.py:262-272,
README.md:133).  Here the packed format is the checkpoint: integer codes
at exactly b bits/weight plus per-group scales/zeros, alongside the
not-quantized params (embeddings, norms), in a single .npz (plus a JSON
sidecar for configs).  An INT4 Qwen3-8B checkpoint is ~4.7 GB vs 16 GB
fp16.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np

from tgq.core.packing import PackedLinear
from tgq.models.config import ModelConfig


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}." if prefix or True else k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    elif isinstance(tree, PackedLinear):
        out[f"{prefix}codes"] = np.asarray(tree.codes)
        out[f"{prefix}scale"] = np.asarray(tree.scale)
        out[f"{prefix}zero"] = np.asarray(tree.zero)
        if tree.bias is not None:
            out[f"{prefix}bias"] = np.asarray(tree.bias)
        out[f"{prefix}__packed__"] = np.asarray(
            [tree.bits, tree.group_size, tree.in_features, tree.out_features]
        )
    else:
        out[prefix.rstrip(".")] = np.asarray(tree)
    return out


# bump when any sub-byte packed-code layout changes (migration notes in
# the load_quantized error message); v2 = int3 "planes21" (r5)
PACK_LAYOUT_VERSION = 2


def save_quantized(
    path: str,
    params: Any,
    packed: dict[str, PackedLinear],
    cfg: ModelConfig,
    qconfig: dict | None = None,
    kv_equalizers: tuple | None = None,
    shard_layers: bool = False,
) -> None:
    """Write a packed checkpoint directory: weights.npz + config.json.

    ``params`` supplies the non-quantized leaves (embed, norms, and any
    linear without a packed entry); packed entries override the dense
    weights of their layer paths.  ``kv_equalizers``: optional
    (k_eq, v_eq) per-channel KV profiles (tgq.serve.kv_calibrate) stored
    under reserved ``__kv_eq__`` names — tgq-serve picks them up
    automatically for quantized KV caches.

    ``shard_layers``: write one ``layer_%03d.npz`` per decoder layer
    (names relative to the layer) next to the base ``weights.npz`` —
    the 70B-scale format: ``load_quantized`` then streams layer by
    layer (optionally device-placing each before the next loads), so
    peak host memory is one layer, not the whole model, and a partial
    copy fails fast instead of truncating one giant archive.
    """
    os.makedirs(path, exist_ok=True)
    flat = {}
    if kv_equalizers is not None:
        k_eq, v_eq = kv_equalizers
        flat["__kv_eq__k"] = np.asarray(k_eq, np.float32)
        flat["__kv_eq__v"] = np.asarray(v_eq, np.float32)
    # non-quantized parts of the tree (skip dense weights that are packed)
    dense = _flatten(params)
    packed_prefixes = {f"model.{k}" for k in packed}
    for name, arr in dense.items():
        if any(name.startswith(p + ".") for p in packed_prefixes):
            continue
        if arr.dtype == jax.numpy.bfloat16:
            flat[f"__bf16__{name}"] = arr.view(np.uint16)
        else:
            flat[name] = arr
    for key, pl in packed.items():
        flat.update(_flatten(pl, f"model.{key}."))

    n_shards = 0
    if shard_layers:
        per_layer: dict[int, dict[str, np.ndarray]] = {}
        base: dict[str, np.ndarray] = {}
        for name, arr in flat.items():
            stripped = name[len("__bf16__"):] if name.startswith("__bf16__") \
                else name
            parts = stripped.split(".")
            if (len(parts) > 3 and parts[0] == "model"
                    and parts[1] == "layers" and parts[2].isdigit()):
                li = int(parts[2])
                rel = ".".join(parts[3:])
                if name.startswith("__bf16__"):
                    rel = f"__bf16__{rel}"
                per_layer.setdefault(li, {})[rel] = arr
            else:
                base[name] = arr
        n_shards = max(per_layer) + 1 if per_layer else 0
        for li, shard in per_layer.items():
            np.savez(os.path.join(path, f"layer_{li:03d}.npz"), **shard)
        flat = base
    np.savez(os.path.join(path, "weights.npz"), **flat)
    meta = {"model_config": dataclasses.asdict(cfg),
            "quant_config": qconfig or {},
            # sub-byte code layout version: 2 = int3 "planes21"
            # (core.packing r5); v1 checkpoints (triple-byte int3
            # bit-planes) must be re-packed — load_quantized refuses
            # them for 3-bit weights rather than silently mis-decoding
            "pack_layout": PACK_LAYOUT_VERSION}
    if n_shards:
        meta["layer_shards"] = n_shards
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(meta, f, indent=2)


def _insert(tree, dotted, value):
    parts = dotted.split(".")
    cur = tree
    for i, p in enumerate(parts[:-1]):
        nxt = parts[i + 1]
        if p.isdigit():
            p = int(p)
        if isinstance(cur, list):
            while len(cur) <= p:
                cur.append({})
            if not cur[p]:
                cur[p] = [] if nxt.isdigit() else {}
            cur = cur[p]
        else:
            if p not in cur or not cur[p]:
                cur[p] = [] if nxt.isdigit() else {}
            cur = cur[p]
    last = parts[-1]
    last = int(last) if last.isdigit() else last
    if isinstance(cur, list):
        while len(cur) <= last:
            cur.append(None)
        cur[last] = value
    else:
        cur[last] = value


def _decode_arrays(data: dict, tree: dict, kv_eq: dict) -> None:
    """Regroup one npz's arrays into ``tree`` (PackedLinear groups
    reassembled, __bf16__ views restored, __kv_eq__ split out)."""
    packed_groups: dict[str, dict[str, np.ndarray]] = {}
    plain: dict[str, np.ndarray] = {}
    for name, arr in data.items():
        if name.startswith("__kv_eq__"):
            kv_eq[name[len("__kv_eq__"):]] = arr
            continue
        if name.startswith("__bf16__"):
            import ml_dtypes

            plain[name[len("__bf16__"):]] = arr.view(ml_dtypes.bfloat16)
            continue
        base, leaf = name.rsplit(".", 1) if "." in name else ("", name)
        if leaf in ("codes", "scale", "zero", "bias", "__packed__") and base:
            packed_groups.setdefault(base, {})[leaf] = arr
        else:
            plain[name] = arr

    # only treat a group as PackedLinear when the __packed__ marker is
    # present; a plain param that merely ends in .bias/.scale/... (e.g. a
    # future dense '.bias' leaf) falls back to the plain-param path
    # instead of a KeyError on parts["codes"]
    for base, parts in list(packed_groups.items()):
        if "__packed__" not in parts:
            for leaf, arr in parts.items():
                plain[f"{base}.{leaf}"] = arr
            del packed_groups[base]

    for name, arr in plain.items():
        _insert(tree, name, arr)
    for base, parts in packed_groups.items():
        bits, gs, in_f, out_f = (int(x) for x in parts["__packed__"])
        pl = PackedLinear(
            codes=parts["codes"], scale=parts["scale"], zero=parts["zero"],
            bits=bits, group_size=gs, in_features=in_f, out_features=out_f,
            bias=parts.get("bias"),
        )
        _insert(tree, base, pl)


def load_quantized(path: str, layer_callback=None):
    """Load a packed checkpoint → (params tree with PackedLinear leaves,
    ModelConfig, quant_config dict).

    For layer-sharded checkpoints (``save_quantized(shard_layers=True)``,
    the 70B-scale format) layers stream one npz at a time;
    ``layer_callback(li, layer_tree) -> layer_tree`` runs on each layer
    subtree as soon as it is assembled — e.g. ``jax.device_put`` with
    that layer's TP shardings — so peak host memory is bounded by one
    layer instead of the whole model."""
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    cfg = ModelConfig(**meta["model_config"])
    layout = int(meta.get("pack_layout", 1))
    if layout != PACK_LAYOUT_VERSION:
        w_bits = int(meta.get("quant_config", {}).get("w_bits", 0))
        if w_bits == 3 or w_bits == 0:
            raise ValueError(
                f"checkpoint pack_layout v{layout} != current "
                f"v{PACK_LAYOUT_VERSION}: the int3 code layout changed "
                "(triple-byte bit-planes -> planes21, r5).  Re-quantize "
                "or re-pack the checkpoint: load the dense bf16 leaves "
                "with the old tgq revision, then save_quantized with "
                "this one.  (int4/int2/int8 layouts are unchanged; "
                "checkpoints at those widths load by setting "
                "pack_layout in config.json.)")
    kv_eq: dict[str, np.ndarray] = {}
    tree: dict = {}
    with np.load(os.path.join(path, "weights.npz")) as data:
        _decode_arrays(dict(data), tree, kv_eq)
    n_shards = int(meta.get("layer_shards", 0))
    if n_shards:
        layers = tree.setdefault("model", {}).setdefault("layers", [])
        for li in range(n_shards):
            sub: dict = {}
            with np.load(
                    os.path.join(path, f"layer_{li:03d}.npz")) as data:
                _decode_arrays(dict(data), sub, kv_eq)
            if layer_callback is not None:
                sub = layer_callback(li, sub)
            while len(layers) <= li:
                layers.append(None)
            layers[li] = sub
    qconf = dict(meta.get("quant_config", {}))
    if kv_eq:
        qconf["kv_equalizers"] = (kv_eq["k"], kv_eq["v"])
    return tree, cfg, qconf
