"""Headline benchmark: one full Qwen3-8B decoder layer quantized
end-to-end (TruncGPTQ) on the attached TPU, vs the reference's A100.

Measures the real pipeline path per layer — the four sequential
layer-groups exactly as in calibration: group-input forwards over the
full 128×2048-token calibration set, on-device Hessian accumulation,
TruncGPTQ factorization (pivoted-Cholesky fast path), blockwise
quantization of all 7 projections, and the quantized re-forward.

Baseline: the reference's published Trunc_W4_Asym run is 1534.3 s for 36
layers on one A100-40G with the same calibration set → 42.6 s/layer
(BASELINE.md; benchmark_results/Trunc_W4_Asym/results.json, and its
quantization.log shows layer 1 at 44 s wall).

Prints TWO JSON lines:
  {"metric": "qwen3_8b_layer_quantize_seconds", "value": <s>,
   "unit": "s", "vs_baseline": <42.6 / value>}  (>1 = faster than ref)
  {"metric": "qwen3_8b_decode_tok_s", "value": <tok/s>, ...}
    — a short fixed-config serving run (random-init packed qwen3-8b,
    64 slots, prompt 128 / gen 128, INT8 KV, INT8 vocab head) through
    the real continuous-batching engine (tgq.cli.serve.run).  The
    reference publishes no serving numbers (BASELINE.md), so
    vs_baseline is null; the value externally verifies RESULTS.md's
    serving table.

Always emits parseable JSON lines, even on TPU backend-init failure
(status field carries the error); one retry on backend unavailability.
"""
import argparse
import json
import sys
import time

import numpy as np

BASELINE_S = 1534.3 / 36.0  # reference Trunc_W4_Asym seconds per layer (A100)


def _init_backend(retries: int = 1, wait_s: float = 30.0):
    """Import jax and force backend init, retrying once on UNAVAILABLE.

    The axon TPU tunnel can be transiently unreachable; round 1 died with
    an uncaught RuntimeError here (VERDICT weak #1).  Returns
    (jax, backend_name) or (jax, None) if only initialization failed.
    """
    import jax

    last_err = None
    for attempt in range(retries + 1):
        try:
            backend = jax.default_backend()
            jax.devices()  # force full client init
            return jax, backend
        except Exception as e:  # RuntimeError/JaxRuntimeError on init failure
            last_err = e
            print(f"[bench] backend init failed "
                  f"(attempt {attempt + 1}/{retries + 1}): {e}",
                  file=sys.stderr)
            if attempt < retries:
                time.sleep(wait_s)
    # final fallback: explicit CPU so the bench still produces a number
    try:
        cpu = jax.devices("cpu")
        if cpu:
            jax.config.update("jax_default_device", cpu[0])
            return jax, "cpu-fallback"
    except Exception:
        pass
    print(json.dumps({
        "metric": "qwen3_8b_layer_quantize_seconds",
        "value": None, "unit": "s", "vs_baseline": None,
        "status": f"backend-init-failed: {last_err}",
    }))
    raise SystemExit(0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_samples", type=int, default=128)
    ap.add_argument("--seq_len", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--mode", type=str, default="pchol")
    ap.add_argument("--w_bits", type=int, default=4)
    ap.add_argument("--kernel_backend", type=str, default="jnp",
                    choices=("jnp", "pallas"))
    ap.add_argument("--sync_phases", action="store_true",
                    help="fence the device after every phase for honest "
                         "per-phase attribution (serializes the pipeline)")
    ap.add_argument("--no_serve", action="store_true",
                    help="skip the serving benchmark line")
    ap.add_argument("--no_quantize", action="store_true",
                    help="skip the layer-quantization benchmark line")
    args = ap.parse_args()

    jax, backend = _init_backend()
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    on_tpu = backend == "tpu"

    if not args.no_quantize:
        _quantize_bench(args, jax, jnp, backend, on_tpu)
    if not args.no_serve:
        try:
            _serve_bench(on_tpu)
        except Exception as e:
            import traceback

            traceback.print_exc()
            print(json.dumps({
                "metric": "qwen3_8b_decode_tok_s",
                "value": None, "unit": "tok/s", "vs_baseline": None,
                "status": f"serve-bench-failed: {type(e).__name__}: {e}",
            }))


def _serve_bench(on_tpu: bool) -> None:
    """Fixed-config serving benchmark (VERDICT r2 directive #2): the
    real continuous-batching engine on a random-init packed model,
    decode-only tok/s as the metric.  CPU fallback smoke-tests the tiny
    preset so the line is always parseable."""
    from tgq.cli import serve as serve_cli

    if not on_tpu:
        argv = ["--model_id", "tiny-qwen3", "--w_bits", "8",
                "--group_size", "32", "--kv_bits", "8", "--max_slots", "4",
                "--prompt_len", "16", "--gen_tokens", "16",
                "--n_requests", "8", "--decode_chunk", "4"]
        print("[bench] serving benchmark (tiny) ...", file=sys.stderr)
        res = serve_cli.run(serve_cli.build_parser().parse_args(argv))
        print(json.dumps({
            "metric": "qwen3_8b_decode_tok_s",
            "value": res["decode_only_tok_s"], "unit": "tok/s",
            "vs_baseline": None, "overall_tok_s": res["value"],
            "ttft_p50_s": res["ttft_p50_s"], "config": res["config"],
            "status": "backend=cpu: smoke-test on tiny-qwen3; "
                      "not comparable",
        }))
        return

    base = ["--model_id", "qwen3-8b", "--w_bits", "4",
            "--lm_head_bits", "8", "--kv_bits", "8",
            "--prompt_len", "128", "--gen_tokens", "128",
            "--n_requests", "128", "--decode_chunk", "16"]
    # two configs: 64 slots matches BENCH_r03's serving line key-for-key
    # (round-over-round comparability); 128 slots + W4A8 is the
    # throughput config — saturating the chip's slot capacity is where
    # decode is MXU/BW-balanced rather than weight-stream-bound, W4A8
    # halves the prefill compute (int8 MXU), and chunked prefill
    # admission keeps TTFT near its compute floor.  A8's measured e2e
    # quality cost on the trained-tiny harness: +0.0007 ppl on top of
    # W4's +0.044 (test_pipeline_e2e.py::test_a8_...).
    # 192 slots W4A8 is the throughput ceiling on one 16 GB v5e (the KV
    # pool + weights cap the slot count — 256 OOMs), trading TTFT
    # (~1.2 s: the median request waits behind ~12k tokens of prefill
    # compute) for peak decode; 128 slots meets every r3 serving
    # directive at once (TTFT p50 <= 1 s, overall >= 3200).
    for metric, slots, extra in (
            ("qwen3_8b_decode_tok_s", 64, []),
            ("qwen3_8b_serving_best", 128,
             ["--a_bits", "8", "--page_size", "128"]),
            ("qwen3_8b_serving_max_throughput", 192,
             ["--a_bits", "8", "--page_size", "128",
              "--n_requests", "192"])):
        print(f"[bench] serving benchmark (qwen3-8b, {slots} slots"
              f"{' W4A8' if extra else ''}) ...", file=sys.stderr)
        res = serve_cli.run(serve_cli.build_parser().parse_args(
            base + ["--max_slots", str(slots)] + extra))
        print(json.dumps({
            "metric": metric,
            "value": res["decode_only_tok_s"],
            "unit": "tok/s",
            # the reference publishes no serving/throughput numbers
            # (BASELINE.md); these lines externally verify RESULTS.md
            "vs_baseline": None,
            "overall_tok_s": res["value"],
            "ttft_p50_s": res["ttft_p50_s"],
            "config": res["config"],
        }))


def _quantize_bench(args, jax, jnp, backend, on_tpu) -> None:
    from tgq.calib.pipeline import QuantizeConfig, quantize_layer
    from tgq.models import PRESETS, init_params, rope_cache
    from tgq.models.causal_lm import sequenced_groups

    on_tpu = backend == "tpu"
    attn_impl = "flash" if on_tpu else "naive"
    preset = "qwen3-8b"
    if not on_tpu:
        # 8B-geometry Hessian factorizations (12288^2) are infeasible on
        # host CPU regardless of sample count; smoke-test the tiny preset
        # and say so in the status field
        preset = "tiny-qwen3"
        args.n_samples = min(args.n_samples, 4)
        args.seq_len = min(args.seq_len, 128)
        args.batch_size = min(args.batch_size, 2)
        print(f"[bench] backend={backend}: smoke-test on {preset} "
              f"(n={args.n_samples}, s={args.seq_len})", file=sys.stderr)
    cfg = PRESETS[preset]
    qcfg = QuantizeConfig(mode=args.mode, w_bits=args.w_bits,
                          group_size=128 if on_tpu else -1,
                          batch_size=args.batch_size, eps=1e-6,
                          threshold_method="energy", log_rel_error=False,
                          kernel_backend=args.kernel_backend)

    # one random decoder layer + calibration activations at real shapes
    key = jax.random.key(0)
    params = init_params(
        type(cfg)(**{**cfg.__dict__, "num_layers": 1}), key
    )
    lp = params["model"]["layers"][0]
    n, s, bs = args.n_samples, args.seq_len, args.batch_size
    inps = (jax.random.normal(jax.random.key(1), (n, s, cfg.hidden_size),
                              jnp.float32) * 0.5).astype(jnp.bfloat16)
    cos, sin = rope_cache(cfg, s)
    groups = sequenced_groups(cfg)
    spec = qcfg.spec

    def run_layer(lp, timers=None):
        """The per-layer quantization flow — the real pipeline path."""
        from tgq.utils.profiling import PhaseTimers

        timers = timers or PhaseTimers(sync=args.sync_phases)
        t0 = time.time()
        lp, outs, _, _ = quantize_layer(lp, cfg, inps, cos, sin, qcfg,
                                        timers=timers)
        # remote tunnels report ready before execution finishes; a
        # host transfer forces true completion for honest timing
        _ = np.asarray(outs[-1][:1, :1, :8])
        return time.time() - t0, timers

    lp_dev = jax.device_put(lp)
    print(f"[bench] warm-up (compiles)...", file=sys.stderr)
    run_layer(jax.device_put(lp))          # warm-up, discarded
    t, timers = run_layer(lp_dev)
    for k, v in timers.summary().items():
        print(f"[bench] {k:16s} {v['total_s']:7.2f}s (n={v['count']})",
              file=sys.stderr)

    phases = None
    if on_tpu and not args.sync_phases:
        # honest per-phase attribution needs a host fetch after every
        # phase (async dispatch otherwise charges everything to
        # whichever phase syncs first — r2 verdict weak #6); take it
        # from a separate fenced run so the headline number stays
        # pipeline-parallel
        from tgq.utils.profiling import PhaseTimers

        print("[bench] fenced attribution pass...", file=sys.stderr)
        t_sync, sync_timers = run_layer(jax.device_put(lp),
                                        timers=PhaseTimers(sync=True))
        phases = {k: v["total_s"] for k, v in sync_timers.summary().items()}
        phases["_fenced_total_s"] = round(t_sync, 2)
        for k, v in sync_timers.summary().items():
            print(f"[bench] fenced {k:16s} {v['total_s']:7.2f}s "
                  f"(n={v['count']})", file=sys.stderr)

    out = {
        "metric": "qwen3_8b_layer_quantize_seconds",
        "value": round(t, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / t, 3),
    }
    if phases is not None:
        out["phases_fenced"] = phases
    if not on_tpu:
        out["status"] = (f"backend={backend}: smoke-test on {preset} "
                         f"(n={args.n_samples}, s={args.seq_len}); "
                         f"vs_baseline not comparable")
        out["vs_baseline"] = None
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:  # always leave one parseable JSON line behind
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "qwen3_8b_layer_quantize_seconds",
            "value": None, "unit": "s", "vs_baseline": None,
            "status": f"bench-failed: {type(e).__name__}: {e}",
        }))
        raise SystemExit(0)
