"""Layer-sequential calibration + quantization driver.

TPU-native re-design of the reference pipeline (quantize.py:49-294):

- No hooks, no Catcher exception hack: the model is first-party, so the
  driver calls :func:`embed_tokens` and the decoder-layer *pieces*
  (attn_input / attn_core / mlp_input / mlp_act) to obtain each
  quantization group's input activations directly.
- Per-layer-group Hessians are accumulated on-device with jitted GEMMs;
  factorization runs on the host in f64 (no f64 on TPU); the blockwise
  quantization loop runs on-device.
- The model's parameter tree lives on the host; one layer at a time is
  placed on device (the reference's CPU↔GPU layer migration, quantize.py:
  106,250, re-expressed as device_put / device_get of a pytree).
- Sequential inter-layer error propagation: after a layer is quantized,
  calibration activations are re-forwarded through the *quantized* layer
  to produce the next layer's inputs (quantize.py:238-249).
- Emits a results-log dict schema-compatible with the reference's
  results.json ({config, layer_stats:[{name, rank, time}], metrics}).
"""
from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tgq.core.packing import PackedLinear
from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
from tgq.models.causal_lm import (
    Params,
    attn_core,
    attn_input,
    decoder_layer,
    embed_tokens,
    get_nested,
    mlp_act,
    mlp_input,
    rope_cache,
    sequenced_groups,
    set_nested,
)
from tgq.models.config import ModelConfig
from tgq.solver.factorize import (
    FactorResult,
    gptq_cholesky_factor,
    sketch_factor,
    trunc_spectral_factor,
)
from tgq.solver.gptq_loop import quantize_weight
from tgq.solver.hessian import HessianAccumulator, SketchAccumulator

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class QuantizeConfig:
    """Solver/pipeline flags — names and defaults mirror the reference CLI
    (utils.py:31-130) so configs translate 1:1."""

    mode: str = "eigh"            # eigh | pchol | gptq | svd | rtn
    w_bits: int = 4
    group_size: int = 128
    sym: bool = False
    eps: float = 1e-2
    threshold_method: str = "mean_trimmed"
    actorder: bool = False
    damp_percent: float = 0.01
    adaptive_eps: bool = False
    sketch_ratio: float = 4.0
    batch_size: int = 8
    block_size: int = 256
    kernel_backend: str = "jnp"   # in-block loop: jnp | pallas
    precision: str = "f64"        # factorization: f64 (host) | f32 (device)
    attn_impl: str = "auto"
    pack: bool = True             # also collect packed INT export
    log_rel_error: bool = True    # per-module rel-prediction-error metric
    seed: int = 42

    @property
    def spec(self) -> QuantSpec:
        return QuantSpec(bits=self.w_bits, group_size=self.group_size, sym=self.sym)


def get_adaptive_eps(layer_name: str, base_eps: float) -> float:
    """ε×0.1 for the sensitive projections (reference quantize.py:17-20).
    gpt2 analog: both output projections are named c_proj; opt analog:
    out_proj and fc2."""
    if any(x in layer_name for x in
           ("down_proj", "o_proj", "c_proj", "out_proj", "fc2")):
        return base_eps * 0.1
    return base_eps


def _group_in_features(cfg: ModelConfig, gi: int) -> int:
    return [cfg.hidden_size, cfg.q_size, cfg.hidden_size, cfg.intermediate_size][gi]


@partial(jax.jit, static_argnames=("cfg", "gi", "attn_impl"))
def _group_input(lp, cfg: ModelConfig, gi: int, x, cos, sin, attn_impl="auto"):
    """Activation feeding quantization group ``gi`` of one decoder layer."""
    if gi == 0:
        return attn_input(lp, cfg, x)
    h = attn_input(lp, cfg, x)
    attn = attn_core(lp, cfg, h, cos, sin, attn_impl=attn_impl)
    if gi == 1:
        return attn
    from tgq.models.causal_lm import attn_out_proj

    x2 = x + attn_out_proj(lp, cfg, attn)
    h2 = mlp_input(lp, cfg, x2)
    if gi == 2:
        return h2
    return mlp_act(lp, cfg, h2)


@partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _layer_forward(lp, cfg: ModelConfig, x, cos, sin, attn_impl="auto"):
    return decoder_layer(lp, cfg, x, cos, sin, attn_impl=attn_impl)


# Staged single-pass forwards: each stage of the decoder layer is
# computed once per calibration batch and its output reused as the next
# group's input AND the next stage's operand, instead of re-running the
# layer prefix for every group the way the reference's hook captures do
# (quantize.py:139-146).  The staged values also make the final
# re-forward a single down_proj matmul from (x2, h2) — no full layer
# recompute (quantize.py:238-248).


@partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _stage_attn(lp, cfg: ModelConfig, x, cos, sin, attn_impl="auto"):
    """Attention output (group 1's input), with group-0-quantized q/k/v."""
    return attn_core(lp, cfg, attn_input(lp, cfg, x), cos, sin,
                     attn_impl=attn_impl)


@partial(jax.jit, static_argnames=("cfg",))
def _stage_resid(lp, cfg: ModelConfig, x, attn):
    """x2: post-attention residual (with group-1-quantized o_proj).
    Only x2 is staged — h2 = mlp_input(x2) is one RMS norm, recomputed
    on demand; storing it too OOMed a 16 GB v5e at 8B shapes."""
    from tgq.models.causal_lm import attn_out_proj

    return x + attn_out_proj(lp, cfg, attn)


@partial(jax.jit, static_argnames=("cfg",))
def _stage_mlp_in(lp, cfg: ModelConfig, x2):
    """h2 (group 2's input) from the staged residual."""
    return mlp_input(lp, cfg, x2)


@partial(jax.jit, static_argnames=("cfg",))
def _stage_act(lp, cfg: ModelConfig, x2):
    """silu(gate)·up (group 3's input), with group-2-quantized gate/up."""
    return mlp_act(lp, cfg, mlp_input(lp, cfg, x2))


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _accum_act_gram_t(h, lp, cfg: ModelConfig, x2):
    """Fused group-3 accumulate for the llama family: h2 → gate/up in
    TRANSPOSED (ff, T) orientation → silu·up → Gram contracting the
    token dim, one dispatch per batch.

    The producer dots emit (ff, T) directly (weights are (out, in), so
    it is just the flipped contraction — no relayout op anywhere) and
    the token-dim-minor Gram runs ~8 ms/batch faster than the (T, ff)
    form at Qwen3-8B gi-3 shapes (measured producer+Gram 171 → 179 TF/s
    on v5e; the isolated 164-vs-130 TF/s Gram gap mostly collapses once
    composed with the producer, which is why only this group adopts the
    transposed staging).  Matches mlp_act's bf16 math: bf16 dots, silu
    in bf16."""
    h2 = mlp_input(lp, cfg, x2).reshape(-1, cfg.hidden_size)  # (T, d)
    wg = lp["mlp"]["gate_proj"]["w"]
    wu = lp["mlp"]["up_proj"]["w"]
    gate = jax.lax.dot_general(wg, h2, (((1,), (1,)), ((), ())))
    up = jax.lax.dot_general(wu, h2, (((1,), (1,)), ((), ())))
    act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)       # (ff, T)
    return h + jax.lax.dot_general(
        act, act, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def _stage_out(lp, cfg: ModelConfig, x2):
    """Quantized-layer output from the staged residual — recomputes only
    the MLP with the fully quantized weights."""
    from tgq.models.causal_lm import mlp_out_proj

    return x2 + mlp_out_proj(lp, cfg,
                             mlp_act(lp, cfg, mlp_input(lp, cfg, x2)))


def _layer_forward_staged(lp, cfg: ModelConfig, x, cos, sin, attn_impl="auto"):
    """Full layer forward through the SAME staged jit chain quantize_layer
    uses for its outputs — bit-identical to an uninterrupted run's
    propagated activations (a monolithic jit fuses differently in bf16),
    which per-layer resume relies on."""
    attn = _stage_attn(lp, cfg, x, cos, sin, attn_impl=attn_impl)
    return _stage_out(lp, cfg, _stage_resid(lp, cfg, x, attn))


def _factorize(h_or_y, qcfg: QuantizeConfig, eps: float) -> FactorResult:
    if qcfg.mode == "eigh":
        return trunc_spectral_factor(
            h_or_y, eps=eps, method=qcfg.threshold_method, precision=qcfg.precision
        )
    if qcfg.mode == "gptq":
        return gptq_cholesky_factor(
            h_or_y, actorder=qcfg.actorder, damp_percent=qcfg.damp_percent
        )
    if qcfg.mode == "svd":
        return sketch_factor(h_or_y, eps=eps, method=qcfg.threshold_method)
    if qcfg.mode == "pchol":
        from tgq.solver.pchol import pchol_factor

        return pchol_factor(h_or_y, eps=eps, want_rx=qcfg.log_rel_error)
    raise ValueError(f"no factorization for mode {qcfg.mode!r}")


def _rtn_quantize(w: jax.Array, spec: QuantSpec):
    p = find_params(w, spec)
    s, z = expand_params(p, w.shape[1])
    codes = quantize(w, s, z, spec)
    wq = (codes - z) * s
    return codes.astype(jnp.int32), wq, p


def _save_resume_layer(resume_dir: str, li: int, layer_host: Params,
                       packed: dict, log: dict) -> None:
    """Persist one finished layer (dense write-back + packed leaves +
    its layer_stats) and advance the progress marker atomically."""
    import json
    import os

    os.makedirs(resume_dir, exist_ok=True)
    flat: dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}{k}.")
        elif isinstance(tree, PackedLinear):
            flat[f"{prefix}codes"] = np.asarray(tree.codes)
            flat[f"{prefix}scale"] = np.asarray(tree.scale)
            flat[f"{prefix}zero"] = np.asarray(tree.zero)
            if tree.bias is not None:
                flat[f"{prefix}bias"] = np.asarray(tree.bias)
            flat[f"{prefix}__packed__"] = np.asarray(
                [tree.bits, tree.group_size, tree.in_features,
                 tree.out_features])
        else:
            arr = np.asarray(tree)
            if arr.dtype == jnp.bfloat16:
                flat[f"__bf16__{prefix[:-1]}"] = arr.view(np.uint16)
            else:
                flat[prefix[:-1]] = arr

    walk(layer_host)
    for key, pl in packed.items():
        if key.startswith(f"layers.{li}."):
            walk(pl, f"__packed_export__{key}.")
    tmp = os.path.join(resume_dir, f"layer_{li}.tmp.npz")
    np.savez(tmp, **flat)
    os.replace(tmp, os.path.join(resume_dir, f"layer_{li}.npz"))
    stats = [s for s in log["layer_stats"] if s["name"].startswith(f"layer_{li}.")]
    prog_tmp = os.path.join(resume_dir, "progress.json.tmp")
    prog_path = os.path.join(resume_dir, "progress.json")
    done = {}
    if os.path.exists(prog_path):
        with open(prog_path) as f:
            done = json.load(f)
    done[str(li)] = stats
    with open(prog_tmp, "w") as f:
        json.dump(done, f)
    os.replace(prog_tmp, prog_path)


def _load_resume(resume_dir: str, params: Params, packed: dict, log: dict,
                 n_layers: int) -> int:
    """Restore the longest completed prefix of layers; returns the first
    layer still to do."""
    import json
    import os

    prog_path = os.path.join(resume_dir, "progress.json")
    if not os.path.exists(prog_path):
        return 0
    with open(prog_path) as f:
        done = json.load(f)
    import ml_dtypes

    start = 0
    while start < n_layers and str(start) in done and os.path.exists(
        os.path.join(resume_dir, f"layer_{start}.npz")
    ):
        data = dict(np.load(os.path.join(resume_dir, f"layer_{start}.npz")))
        layer: dict = {}
        packed_groups: dict[str, dict] = {}

        def insert(dotted, value, root):
            parts = dotted.split(".")
            cur = root
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = value

        for name, arr in data.items():
            if name.startswith("__packed_export__"):
                base, leaf = name[len("__packed_export__"):].rsplit(".", 1)
                packed_groups.setdefault(base, {})[leaf] = arr
            elif name.startswith("__bf16__"):
                insert(name[len("__bf16__"):], arr.view(ml_dtypes.bfloat16), layer)
            else:
                insert(name, arr, layer)
        params["model"]["layers"][start] = layer
        for base, parts in packed_groups.items():
            bits, gs, in_f, out_f = (int(x) for x in parts["__packed__"])
            packed[base] = PackedLinear(
                codes=parts["codes"], scale=parts["scale"], zero=parts["zero"],
                bits=bits, group_size=gs, in_features=in_f, out_features=out_f,
                bias=parts.get("bias"),
            )
        log["layer_stats"].extend(done[str(start)])
        start += 1
    return start


def _shard_layer(lp, mesh):
    """TP-shard one decoder layer's params (rules from tgq.parallel)."""
    from tgq.parallel import shard_params

    return shard_params(lp, mesh)


def spectral_consistency_check(
    params: Params,
    cfg: ModelConfig,
    input_ids: np.ndarray,
    qcfg: QuantizeConfig,
    max_layers: int = 1,
) -> list[dict]:
    """Reference mode "test" (quantize.py:186-199): per layer-group,
    compare sqrt(λ_max(H)) against the sketch's top singular value — a
    consistency check that the randomized sketch estimates the Hessian
    spectrum.  Returns one record per group checked."""
    n_samples, seq_len = input_ids.shape
    bs = qcfg.batch_size
    cos, sin = rope_cache(cfg, seq_len)
    groups = sequenced_groups(cfg)
    from tgq.models.causal_lm import embed_tokens as _embed

    emb_params = {"model": {
        k: jax.device_put(params["model"][k])
        for k in (("embed_tokens", "wpe") if cfg.family in ("gpt2", "opt")
                  else ("embed_tokens",))
    }}
    emb = jax.jit(lambda p, ids: _embed(p, ids, cfg=cfg))
    inps = jnp.concatenate([
        emb(emb_params, jnp.asarray(input_ids[j : j + bs]))
        for j in range(0, n_samples, bs)
    ])
    records = []
    for li in range(min(max_layers, len(params["model"]["layers"]))):
        lp = jax.device_put(params["model"]["layers"][li])
        for gi, group_names in enumerate(groups):
            in_f = _group_in_features(cfg, gi)
            acc_h = HessianAccumulator.init(in_f)
            acc_s = SketchAccumulator.init(
                in_f, rank=int(in_f * qcfg.sketch_ratio), seed=qcfg.seed
            )
            for j in range(0, n_samples, bs):
                a = _group_input(lp, cfg, gi, inps[j : j + bs], cos, sin,
                                 attn_impl=qcfg.attn_impl)
                acc_h = acc_h.update(a)
                acc_s = acc_s.update(a)
            h = np.asarray(acc_h.finalize(), np.float64)
            y = np.asarray(acc_s.finalize(), np.float64)
            h_max_sqrt = float(np.sqrt(max(np.linalg.eigvalsh(h)[-1], 0.0)))
            y_max_sv = float(np.linalg.svd(y, compute_uv=False)[0])
            rec = {
                "name": f"layer_{li}.{group_names[0]}",
                "sqrt_max_eig_H": h_max_sqrt,
                "max_sv_Y": y_max_sv,
                "ratio": h_max_sqrt / y_max_sv if y_max_sv else float("inf"),
            }
            logger.info("spectral check %s: sqrt(λmax)=%.4f max_sv=%.4f ratio=%.4f",
                        rec["name"], h_max_sqrt, y_max_sv, rec["ratio"])
            records.append(rec)
    return records


def quantize_layer(
    lp: Params,
    cfg: ModelConfig,
    inps: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    qcfg: QuantizeConfig,
    timers=None,
    name_prefix: str = "",
):
    """Quantize one decoder layer's four sequential groups.

    Single-pass staged activations: attn (once, after q/k/v quantize),
    then (x2, h2) (once, after o quantize), then act batches on demand —
    and the layer's quantized outputs come from the staged (x2, h2) plus
    the quantized MLP tail.  The reference recomputes the layer prefix
    per group and re-forwards the whole layer at the end
    (quantize.py:139-146,238-248) — ~2.3× the forward FLOPs of this.

    Returns (lp, outs, module_stats, packed) where outs are the
    quantized-layer outputs for every calibration batch (the next
    layer's inputs), module_stats is the reference layer_stats schema,
    and packed maps module path → PackedLinear (empty unless qcfg.pack).
    """
    from tgq.utils.profiling import PhaseTimers

    timers = timers or PhaseTimers()
    n_samples = inps.shape[0]
    bs = qcfg.batch_size
    spec = qcfg.spec
    idx = list(range(0, n_samples, bs))
    groups = sequenced_groups(cfg)
    staged = qcfg.mode != "rtn"  # rtn needs no activations at all
    attn_l = x2_l = h2_l = None
    module_stats: list[dict[str, Any]] = []
    packed: dict[str, PackedLinear] = {}

    for gi, group_names in enumerate(groups):
        eps = (get_adaptive_eps(group_names[0], qcfg.eps)
               if qcfg.adaptive_eps else qcfg.eps)
        in_f = _group_in_features(cfg, gi)

        if staged and gi == 1:
            with timers.phase("stage_fwd"):
                attn_l = [_stage_attn(lp, cfg, inps[j : j + bs], cos, sin,
                                      attn_impl=qcfg.attn_impl) for j in idx]
        elif staged and gi == 2:
            with timers.phase("stage_fwd"):
                x2_l = [_stage_resid(lp, cfg, inps[j : j + bs], attn_l[jj])
                        for jj, j in enumerate(idx)]
                attn_l = None  # freed — superseded by x2

        def group_act(jj: int, j: int):
            if gi == 0:
                return _group_input(lp, cfg, 0, inps[j : j + bs], cos, sin,
                                    attn_impl=qcfg.attn_impl)
            if gi == 1:
                return attn_l[jj]
            if gi == 2:
                return _stage_mlp_in(lp, cfg, x2_l[jj])
            return _stage_act(lp, cfg, x2_l[jj])

        if not staged:
            stats = None
        else:
            if qcfg.mode == "svd":
                acc = SketchAccumulator.init(
                    in_f, rank=int(in_f * qcfg.sketch_ratio), seed=qcfg.seed)
            else:
                acc = HessianAccumulator.init(in_f)
            # gi 3 (the 12288-wide Gram, ~75% of the layer's Gram FLOPs)
            # fuses producer + transposed Gram into one dispatch/batch
            fused_t = (gi == 3 and cfg.family == "llama"
                       and qcfg.mode != "svd"
                       and "b" not in get_nested(lp, "mlp.gate_proj"))
            with timers.phase("accumulate"):
                for jj, j in enumerate(idx):
                    if fused_t:
                        tokens = int(x2_l[jj].size // cfg.hidden_size)
                        acc = HessianAccumulator(
                            h=_accum_act_gram_t(acc.h, lp, cfg, x2_l[jj]),
                            n_samples=acc.n_samples + tokens)
                    else:
                        acc = acc.update(group_act(jj, j))
                h_or_y = acc.finalize()
                if qcfg.mode in ("eigh", "gptq", "svd"):
                    h_or_y = np.asarray(h_or_y)  # host factorization paths
            del acc
            t_f = time.time()
            with timers.phase("factorize"):
                stats = _factorize(h_or_y, qcfg, eps)
            logger.info("   factorized %s in %.2fs (rank %d/%d)",
                        h_or_y.shape, time.time() - t_f, stats.rank, in_f)
            del h_or_y

        for name in group_names:
            t_solve = time.time()
            w = get_nested(lp, name)["w"].astype(jnp.float32)
            with timers.phase("quantize"):
                if stats is None:
                    codes, wq, p = _rtn_quantize(w, spec)
                    rank, rel = w.shape[1], float("nan")
                    scale, zero = p.scale, p.zero
                else:
                    res = quantize_weight(
                        w, stats, spec, block_size=qcfg.block_size,
                        backend=qcfg.kernel_backend,
                        with_error=qcfg.log_rel_error,
                    )
                    codes, wq = res.codes, res.w_q
                    scale, zero = res.scale, res.zero
                    # rel_error stays a DEVICE scalar until the
                    # layer-end flush: float() here blocked the host on
                    # every module's full quantize (a tunnel round-trip
                    # × 7/layer of pipeline bubbles on a remote chip)
                    rank, rel = stats.rank, res.rel_error
            # write back dequantized weight (bf16) for the staged forwards
            old = get_nested(lp, name)
            new_p = dict(old) if isinstance(old, dict) else {}
            new_p["w"] = wq.astype(jnp.bfloat16)
            set_nested(lp, name, new_p)
            if qcfg.pack:
                packed[name] = PackedLinear.from_codes(
                    codes, scale, zero, spec,
                    bias=(jnp.asarray(old["b"], jnp.float32)
                          if isinstance(old, dict) and "b" in old else None))
            solve_time = time.time() - t_solve
            module_stats.append(
                {"name": f"{name_prefix}{name}", "rank": int(rank),
                 "time": solve_time, "rel_error": rel})

    with timers.phase("reforward"):
        if x2_l is not None:
            outs = [_stage_out(lp, cfg, x2) for x2 in x2_l]
        else:  # rtn path never staged
            outs = [_layer_forward(lp, cfg, inps[j : j + bs], cos, sin,
                                   attn_impl=qcfg.attn_impl) for j in idx]
    # flush deferred per-module rel_error scalars with ONE host sync at
    # layer end (all device work above is already dispatched); the
    # per-module log lines keep the format extract_log.py mines
    for m in module_stats:
        rel = m["rel_error"]
        if not isinstance(rel, float):
            m["rel_error"] = rel = float(rel)
        logger.info("   %-22s | rank %5s | rel_err %.4f | %.2fs",
                    m["name"], m["rank"], rel, m["time"])
    return lp, outs, module_stats, packed


def quantize_model(
    params: Params,
    cfg: ModelConfig,
    input_ids: np.ndarray,
    qcfg: QuantizeConfig,
    mesh=None,
    resume_dir: Optional[str] = None,
    stop_after_layer: Optional[int] = None,
) -> tuple[Params, dict[str, PackedLinear], dict[str, Any]]:
    """Quantize every decoder layer in place (layer-sequential).

    params: host-resident param tree (mutated: quantized weights written
    back as bf16 dense).  Returns (params, packed export dict keyed by
    "layers.<i>.<path>", experiment log).

    With ``mesh`` (a ("data","model") Mesh): calibration activations are
    batch-sharded on "data" and layer params TP-sharded on "model" —
    group-input forwards run data-parallel with TP matmuls, and the
    Hessian's token-dim contraction becomes a compiler-inserted
    all-reduce (Gram matrices are additive over samples, so DP
    accumulation is exact).  The factorization and quantize loop run on
    replicated factors.

    With ``resume_dir``: after every finished layer, its quantized state
    (dense bf16 write-back + packed leaves + stats) is persisted there;
    a re-run with the same dir skips completed layers and rebuilds the
    propagated calibration activations by re-forwarding through them —
    a killed sweep loses at most one layer of work (the reference
    restarts from scratch, SURVEY.md §5).  ``stop_after_layer`` bounds
    the sweep (testing / staged runs).
    """
    from tgq.utils.profiling import PhaseTimers

    timers = PhaseTimers()
    n_samples, seq_len = input_ids.shape
    bs = qcfg.batch_size
    spec = qcfg.spec
    log: dict[str, Any] = {
        "config": dataclasses.asdict(qcfg) | {"model": cfg.name},
        "layer_stats": [],
        "metrics": {},
    }
    packed: dict[str, PackedLinear] = {}
    groups = sequenced_groups(cfg)
    cos, sin = rope_cache(cfg, seq_len)

    # capture initial hidden states (reference capture_initial_inputs)
    t_start = time.time()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        put_layer = lambda lp: _shard_layer(lp, mesh)  # noqa: E731
    else:
        batch_shard = repl = None
        put_layer = jax.device_put
    put_repl = (lambda w: jax.device_put(w, repl)) if repl else jax.device_put
    embed_w = put_repl(params["model"]["embed_tokens"]["weight"])
    if cfg.family in ("gpt2", "opt"):  # learned position embeddings
        from tgq.models.opt import _POS_OFFSET

        off = _POS_OFFSET if cfg.family == "opt" else 0
        wpe_w = put_repl(params["model"]["wpe"]["weight"])
        emb = jax.jit(lambda w, wpe, ids: (
            w[ids] + wpe[off:off + ids.shape[1]][None]).astype(jnp.bfloat16))
        emb_args = lambda ids: (embed_w, wpe_w, ids)  # noqa: E731
    else:
        emb = jax.jit(lambda w, ids: w[ids].astype(jnp.bfloat16))
        emb_args = lambda ids: (embed_w, ids)  # noqa: E731
    batches = []
    for j in range(0, n_samples, bs):
        ids = jnp.asarray(input_ids[j : j + bs])
        if batch_shard is not None:
            ids = jax.device_put(ids, batch_shard)
        batches.append(emb(*emb_args(ids)))
    inps = jnp.concatenate(batches, axis=0)
    if batch_shard is not None:
        inps = jax.device_put(inps, batch_shard)
    del embed_w, emb_args, batches
    logger.info("[calib] captured %d sequences of %d tokens", n_samples, seq_len)

    n_layers = len(params["model"]["layers"])
    start_layer = 0
    if resume_dir is not None:
        start_layer = _load_resume(resume_dir, params, packed, log, n_layers)
        if start_layer > 0:
            logger.info("[resume] layers 0..%d restored; re-forwarding "
                        "calibration activations", start_layer - 1)
            refwd = (_layer_forward if qcfg.mode == "rtn"
                     else _layer_forward_staged)
            for li in range(start_layer):
                lp = put_layer(params["model"]["layers"][li])
                outs = [
                    refwd(lp, cfg, inps[j : j + bs], cos, sin,
                          attn_impl=qcfg.attn_impl)
                    for j in range(0, n_samples, bs)
                ]
                inps = jnp.concatenate(outs, axis=0)
                del lp, outs

    for li in range(start_layer, n_layers):
        layer_t0 = time.time()
        logger.info("[layer %d/%d] groups: %s", li + 1, n_layers,
                    " | ".join(",".join(g) for g in groups))
        lp = put_layer(params["model"]["layers"][li])
        lp, outs, module_stats, layer_packed = quantize_layer(
            lp, cfg, inps, cos, sin, qcfg, timers=timers,
            name_prefix=f"layer_{li}.")
        log["layer_stats"].extend(module_stats)
        for name, pl in layer_packed.items():
            packed[f"layers.{li}.{name}"] = pl
        inps = jnp.concatenate(outs, axis=0)
        del outs

        # persist quantized layer back to the host tree, free device copy
        params["model"]["layers"][li] = jax.device_get(lp)
        del lp
        if resume_dir is not None:
            _save_resume_layer(resume_dir, li, params["model"]["layers"][li],
                               packed, log)
        logger.info("[*] layer %d/%d done in %.2fs",
                    li + 1, n_layers, time.time() - layer_t0)
        if stop_after_layer is not None and li >= stop_after_layer:
            logger.info("[*] stopping after layer %d as requested", li)
            break

    log["metrics"]["total_time"] = time.time() - t_start
    log["metrics"]["phase_timing"] = timers.summary()
    timers.log_summary()
    return params, packed, log
