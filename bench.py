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

Prints ONE JSON line:
  {"metric": "qwen3_8b_layer_quantize_seconds", "value": <s>,
   "unit": "s", "vs_baseline": <42.6 / value>}  (>1 = faster than ref)
"""
import argparse
import json
import sys
import time

import numpy as np


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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from tgq.calib.pipeline import QuantizeConfig, quantize_layer
    from tgq.models import PRESETS, init_params, rope_cache
    from tgq.models.causal_lm import sequenced_groups

    cfg = PRESETS["qwen3-8b"]
    qcfg = QuantizeConfig(mode=args.mode, w_bits=args.w_bits, group_size=128,
                          batch_size=args.batch_size, eps=1e-6,
                          threshold_method="energy", log_rel_error=False,
                          kernel_backend=args.kernel_backend)
    on_tpu = jax.default_backend() == "tpu"
    attn_impl = "flash" if on_tpu else "naive"

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

    baseline_s = 1534.3 / 36.0
    print(json.dumps({
        "metric": "qwen3_8b_layer_quantize_seconds",
        "value": round(t, 2),
        "unit": "s",
        "vs_baseline": round(baseline_s / t, 3),
    }))


if __name__ == "__main__":
    main()
