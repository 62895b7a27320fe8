"""Serving entry point + throughput benchmark harness.

``tgq-serve --checkpoint <dir>`` loads a packed-INT checkpoint (or a
preset with on-the-fly RTN packing for synthetic runs) and drives the
continuous-batching engine with a synthetic load, reporting decode
throughput (tokens/s), time-to-first-token, and per-request latency —
the BASELINE.json north-star serving metrics (the reference publishes no
serving numbers, SURVEY.md §6).
"""
from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np


def load_or_make_model(args):
    import jax
    import jax.numpy as jnp

    from tgq.models.hf_import import resolve_model

    if args.checkpoint:
        from tgq.core.checkpoint import load_quantized

        params, cfg, qconf = load_quantized(args.checkpoint)
        _maybe_pack_head(params, args, jnp)
        return params, cfg, qconf.get("kv_equalizers")

    from tgq.models.config import PRESETS

    if args.model_id in PRESETS and args.w_bits < 16 \
            and not PRESETS[args.model_id].attention_bias:
        # synthetic benchmark fast path: generate + RTN-pack each linear
        # on device — no host RNG, no dense transfer
        from tgq.core.quant import QuantSpec
        from tgq.models.hf_import import init_packed_params

        cfg = PRESETS[args.model_id]
        spec = QuantSpec(bits=args.w_bits, group_size=args.group_size,
                         sym=False)
        return init_packed_params(
            cfg, spec, seed=0, lm_head_bits=args.lm_head_bits), cfg, None

    # stage params host-side when a CPU backend is available so a large
    # model never materializes dense on the accelerator
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != "cpu":
        with jax.default_device(cpu):
            params, cfg, _ = resolve_model(args.model_id, seed=0)
    else:
        params, cfg, _ = resolve_model(args.model_id, seed=0)

    if args.w_bits < 16:
        # on-the-fly RTN pack, one layer on-device at a time: only the
        # packed codes (b bits/weight) stay resident
        from tgq.core.packing import PackedLinear
        from tgq.core.quant import QuantSpec, expand_params, find_params, quantize
        from tgq.models.causal_lm import find_linear_paths, get_nested, set_nested

        spec = QuantSpec(bits=args.w_bits, group_size=args.group_size, sym=False)
        for li, lp in enumerate(params["model"]["layers"]):
            for name in find_linear_paths(cfg):
                entry = get_nested(lp, name)
                w = jax.device_put(entry["w"]).astype(jnp.float32)
                p = find_params(w, spec)
                s, z = expand_params(p, w.shape[1])
                q = quantize(w, s, z, spec).astype(jnp.int32)
                set_nested(lp, name, PackedLinear.from_codes(
                    q, p.scale, p.zero, spec,
                    bias=(jnp.asarray(entry["b"], jnp.float32)
                          if "b" in entry else None)))
                del w, entry
            # move the layer's remaining dense leaves (norms, biases)
            params["model"]["layers"][li] = jax.device_put(
                params["model"]["layers"][li])
    params["model"]["embed_tokens"] = jax.device_put(params["model"]["embed_tokens"])
    params["model"]["norm"] = jax.device_put(params["model"]["norm"])
    if "lm_head" in params:
        if not _maybe_pack_head(params, args, jnp):
            params["lm_head"] = jax.device_put(params["lm_head"])
    return params, cfg, None


def _maybe_pack_head(params, args, jnp) -> bool:
    """RTN-pack a dense lm_head when --lm_head_bits asks for it —
    applied on every load path (checkpoint, HF import, preset), not
    just the synthetic fast path.  Returns True if packed."""
    import jax

    head = params.get("lm_head")
    if args.lm_head_bits >= 16 or not isinstance(head, dict):
        return False
    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec, expand_params, find_params, quantize

    spec = QuantSpec(bits=args.lm_head_bits, group_size=args.group_size,
                     sym=False)
    w = jax.device_put(head["w"]).astype(jnp.float32)
    p = find_params(w, spec)
    s, z = expand_params(p, w.shape[1])
    q = quantize(w, s, z, spec).astype(jnp.int32)
    from tgq.core.packing import pad_out

    # lane-pad the vocab dim (kernel keeps its 512-wide out tile;
    # lm_logits slices the logits back to cfg.vocab_size)
    params["lm_head"] = pad_out(
        PackedLinear.from_codes(q, p.scale, p.zero, spec))
    return True


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="packed checkpoint dir (tgq.core.checkpoint)")
    ap.add_argument("--model_id", default="qwen3-8b",
                    help="preset/HF path when no checkpoint given")
    ap.add_argument("--w_bits", type=int, default=4,
                    help="RTN bits for on-the-fly packing (16 = dense)")
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--n_requests", type=int, default=16)
    ap.add_argument("--prompt_len", type=int, default=128)
    ap.add_argument("--gen_tokens", type=int, default=64)
    ap.add_argument("--max_slots", type=int, default=8)
    ap.add_argument("--page_size", type=int, default=64)
    ap.add_argument("--num_pages", type=int, default=0,
                    help="KV page pool size; 0 = auto "
                         "(max_slots * pages-per-request + scratch)")
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--decode_chunk", type=int, default=8,
                    help="decode steps fused per device dispatch")
    ap.add_argument("--prefill_chunk_tokens", type=int, default=4096,
                    help="max padded prompt tokens per admission "
                         "dispatch (0 = one monolithic wave)")
    ap.add_argument("--a_bits", type=int, default=16, choices=(16, 8),
                    help="activation precision for packed matmuls "
                         "(8 = W4A8 int8-MXU path; needs w_bits <= 4)")
    ap.add_argument("--lm_head_bits", type=int, default=16, choices=(16, 8),
                    help="vocab-head quantization (serving only; the "
                         "decode-step vocab matmul reads >1 GB bf16/step "
                         "dense)")
    ap.add_argument("--kv_bits", type=int, default=16, choices=(16, 8, 4),
                    help="KV cache storage: bf16, int8+scales, or "
                         "nibble-packed int4+scales")
    ap.add_argument("--kv_equalize", action="store_true",
                    help="calibrate static per-channel KV equalizers on a "
                         "short synthetic batch before serving (quantized "
                         "KV only; see tgq.serve.kv_calibrate)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arrival_rate", type=float, default=0.0,
                    help="open-loop mode: requests arrive by a Poisson "
                         "process at this rate (req/s) and are submitted "
                         "between engine ticks (Engine.step) instead of "
                         "all up front — TTFT is then measured UNDER "
                         "load, the serving-system headline.  0 = "
                         "closed-loop (pre-submitted queue)")
    ap.add_argument("--profile_dir", default=None,
                    help="write a jax.profiler trace here")
    ap.add_argument("--mesh_model", type=int, default=0,
                    help="TP degree; 0 = single device. With --distributed, "
                         "the mesh spans all hosts (model axis intra-host)")
    ap.add_argument("--mesh_data", type=int, default=1,
                    help="data-parallel degree of the serving mesh")
    ap.add_argument("--distributed", action="store_true",
                    help="jax.distributed.initialize() for multi-host")
    return ap


def run(args) -> dict:
    """Load/pack the model, drive the engine with the synthetic load
    (one warm-up wave + the measured run), and return the metrics dict.
    Shared by the CLI entry point and the driver bench (bench.py)."""
    import jax

    from tgq.serve import Engine, ServeConfig

    mesh = None
    if args.distributed:
        from tgq.parallel.launch import init_distributed

        init_distributed()
    if args.mesh_model:
        from tgq.parallel import make_mesh

        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)

    params, cfg, ckpt_eq = load_or_make_model(args)
    k_eq = v_eq = None
    if ckpt_eq is not None and args.kv_bits < 16:
        k_eq, v_eq = ckpt_eq
        logging.info("[kv-eq] using checkpoint-stored per-channel "
                     "equalizers")
    elif args.kv_equalize and args.kv_bits < 16:
        from tgq.serve.kv_calibrate import estimate_kv_equalizers

        rng0 = np.random.default_rng(args.seed + 1)
        calib = rng0.integers(0, cfg.vocab_size, size=(1, 256))
        t0 = time.time()
        k_eq, v_eq = estimate_kv_equalizers(params, cfg, calib)
        logging.info("[kv-eq] calibrated per-channel equalizers in %.1fs",
                     time.time() - t0)
    max_pages_per_slot = -(-(args.prompt_len + args.gen_tokens + args.page_size)
                           // args.page_size)
    if not args.num_pages:
        # page 0 is the reserved scratch page; size the pool to exactly
        # what max_slots concurrent worst-case requests can touch (the
        # KV pool is the dominant non-weight HBM consumer at 8B scale)
        args.num_pages = args.max_slots * max_pages_per_slot + 1
    scfg = ServeConfig(
        max_slots=args.max_slots, page_size=args.page_size,
        num_pages=args.num_pages, max_pages_per_slot=max_pages_per_slot,
        max_new_tokens=args.gen_tokens, temperature=args.temperature,
        seed=args.seed, decode_chunk=args.decode_chunk, kv_bits=args.kv_bits,
        kv_k_eq=k_eq, kv_v_eq=v_eq,
        prefill_chunk_tokens=args.prefill_chunk_tokens,
        a_bits=args.a_bits,
    )
    eng = Engine(params, cfg, scfg, mesh=mesh)

    rng = np.random.default_rng(args.seed)
    prompts = [rng.integers(0, cfg.vocab_size, size=args.prompt_len).tolist()
               for _ in range(args.n_requests)]

    # warm-up: one full wave compiles the batched prefill at the real
    # admission width plus every decode-chunk tail size
    for p in prompts[: min(args.max_slots, args.n_requests)]:
        eng.submit(p)
    eng.run()
    eng.decode_wall_s = eng.prefill_wall_s = 0.0
    eng.steps = eng.tokens_emitted = 0

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    if args.arrival_rate > 0:
        # open-loop: Poisson arrivals drive Engine.step() — requests
        # land mid-flight and TTFT includes queueing under load
        gaps = rng.exponential(1.0 / args.arrival_rate,
                               size=len(prompts))
        t0 = time.time()
        arrivals = t0 + np.cumsum(gaps)
        reqs = []
        i = 0
        while i < len(prompts) or not eng.idle:
            now = time.time()
            while i < len(prompts) and arrivals[i] <= now:
                reqs.append(eng.submit(prompts[i]))
                i += 1
            if eng.idle and i < len(prompts):
                # nothing in flight: sleep until the next arrival
                time.sleep(max(0.0, arrivals[i] - time.time()))
                continue
            eng.step()
        wall = time.time() - t0
    else:
        reqs = [eng.submit(p) for p in prompts]
        t0 = time.time()
        eng.run()
        wall = time.time() - t0
    if args.profile_dir:
        jax.profiler.stop_trace()

    total_tokens = sum(len(r.output) for r in reqs)
    ttft = [r.first_token_t - r.submit_t for r in reqs]
    out = {
        "metric": "decode_tokens_per_second",
        "value": round(total_tokens / wall, 2),
        "unit": "tok/s",
        "total_tokens": total_tokens,
        "wall_s": round(wall, 2),
        "decode_wall_s": round(eng.decode_wall_s, 2),
        "prefill_wall_s": round(eng.prefill_wall_s, 2),
        "decode_only_tok_s": round(
            (total_tokens - len(reqs)) / max(eng.decode_wall_s, 1e-9), 2),
        "ttft_p50_s": round(float(np.percentile(ttft, 50)), 3),
        "ttft_p90_s": round(float(np.percentile(ttft, 90)), 3),
        "ttft_p99_s": round(float(np.percentile(ttft, 99)), 3),
        "arrival_rate": args.arrival_rate,
        "config": {
            "model": cfg.name, "w_bits": args.w_bits, "kv_bits": args.kv_bits,
            # record the EFFECTIVE activation precision: a_bits=8 with
            # w_bits > 4 marks nothing (Engine warns) and must not be
            # reported as a W?A8 run
            "a_bits": args.a_bits if eng.a8_active else 16,
            "a_bits_requested": args.a_bits,
            "slots": args.max_slots, "decode_chunk": args.decode_chunk,
            "prompt_len": args.prompt_len,
            "gen_tokens": args.gen_tokens, "n_requests": args.n_requests,
        },
    }
    return out


def main(argv=None) -> int:
    from tgq.utils.jax_setup import setup_jax

    setup_jax()
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    print(json.dumps(run(args)))
    return 0


if __name__ == "__main__":
    main()
