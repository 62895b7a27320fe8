"""Microbenchmark: fused dequant-matmul vs speed-of-light.

Decode-shape matmuls are HBM-bandwidth-bound: the floor for one
(tokens × in) @ packed-(in × out) matmul is streaming the packed weights
(bits/8 bytes per weight + per-group scale/zero) once.  This harness
measures achieved bytes/s across the serving shapes of a model preset
and reports the fraction of the chip's peak HBM bandwidth — the
"speed-of-light" discipline the north star asks for (BASELINE.json).

Timing runs all reps inside ONE jit as a ``fori_loop`` whose carry
feeds each matmul's output back into the next input (a real data
dependency, so XLA cannot hoist the matmul out of the loop), and
fetches a single scalar.  Per-dispatch timing is hopeless through a
remote-attached chip: the tunnel costs ~30 ms per dispatch and its
``block_until_ready`` can return before execution completes.

Usage:
  python -m tgq.cli.kernel_bench --model_id qwen3-8b --w_bits 4 --tokens 16
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

# v5e: 819 GB/s HBM BW, 197 bf16 TFLOP/s (public TPU v5e specs)
PEAK_GBPS = {"tpu v5e": 819.0, "tpu v5 lite": 819.0}
DEFAULT_PEAK = 819.0


def weight_bytes(in_f: int, out_f: int, bits: int, group: int) -> int:
    codes = in_f * out_f * bits // 8
    scales = 2 * (in_f // group) * out_f * 4  # f32 scale + zero
    return codes + scales


def main(argv=None) -> int:
    from tgq.utils.jax_setup import setup_jax

    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_id", default="qwen3-8b")
    ap.add_argument("--w_bits", type=int, default=4)
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--tokens", type=int, default=16,
                    help="decode batch (token count)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--peak_gbps", type=float, default=0.0,
                    help="0 = auto from device kind")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec
    from tgq.kernels.dequant_matmul import quantized_matmul
    from tgq.models.config import PRESETS

    cfg = PRESETS[args.model_id]
    spec = QuantSpec(bits=args.w_bits, group_size=args.group_size, sym=False)
    dev = jax.devices()[0]
    peak = args.peak_gbps or PEAK_GBPS.get(
        getattr(dev, "device_kind", "").lower(), DEFAULT_PEAK)

    shapes = {
        "qkv_fused_equiv(q)": (cfg.hidden_size, cfg.q_size),
        "o_proj": (cfg.q_size, cfg.hidden_size),
        "gate_proj": (cfg.hidden_size, cfg.intermediate_size),
        "down_proj": (cfg.intermediate_size, cfg.hidden_size),
    }
    key = jax.random.key(0)
    rows = []
    for name, (in_f, out_f) in shapes.items():
        k1, k2, key = jax.random.split(key, 3)
        codes = jax.random.randint(k1, (out_f, in_f), 0, spec.max_q + 1,
                                   jnp.int32)
        scale = jnp.ones((out_f, max(in_f // args.group_size, 1)), jnp.float32)
        zero = jnp.zeros_like(scale)
        w = PackedLinear.from_codes(codes, scale, zero, spec)
        x = jax.random.normal(k2, (args.tokens, in_f), jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames="reps")
        def many(x, reps, w=w):
            def body(_, x):
                y = quantized_matmul(x, w)
                # scalar feedback: real data dependency, any out shape
                return x + (jnp.sum(y) * 1e-12).astype(x.dtype)
            out = jax.lax.fori_loop(0, reps, body, x)
            return out[0, 0].astype(jnp.float32)

        # Slope timing: t(2N) - t(N) cancels the fixed dispatch+fetch
        # overhead (~30 ms through the tunnel) that would otherwise
        # inflate the per-rep figure.  Keep ALL slope samples — under
        # roughly symmetric tunnel jitter, discarding negative ones
        # biases dt low and the reported GB/s high (advisor r4) — and
        # take the median of the full set; skip the row only when that
        # median is non-positive (hopelessly jittery measurement).
        _ = float(many(x, args.reps))  # compile + settle
        _ = float(many(x, 2 * args.reps))
        slopes = []
        for _attempt in range(8):
            t0 = time.time()
            t_n = float(many(x, args.reps)) * 0 + time.time() - t0
            t0 = time.time()
            t_2n = float(many(x, 2 * args.reps)) * 0 + time.time() - t0
            slopes.append((t_2n - t_n) / args.reps)
        slopes.sort()
        dt = slopes[len(slopes) // 2]
        wb_check = weight_bytes(in_f, out_f, args.w_bits, args.group_size)
        if dt <= 0 or wb_check / dt / 1e9 > 1.2 * peak:
            # non-positive or physically impossible (> HBM peak) median:
            # the tunnel jitter swamped this shape — report it as
            # unstable rather than printing absurd GB/s
            print(f"[kernel] {name}: unstable timing, skipped",
                  flush=True)
            continue
        wb = weight_bytes(in_f, out_f, args.w_bits, args.group_size)
        gbps = wb / dt / 1e9
        rows.append({
            "shape": f"{name} {in_f}x{out_f}", "ms": round(dt * 1e3, 3),
            "weight_GB_s": round(gbps, 1),
            "frac_peak": round(gbps / peak, 3),
        })
        print(f"[kernel] {name:22s} {in_f:6d}x{out_f:<6d} {dt*1e3:7.3f} ms "
              f"{gbps:7.1f} GB/s  ({100*gbps/peak:5.1f}% of {peak:.0f})")

    agg = sum(r["weight_GB_s"] * r["ms"] for r in rows) / sum(
        r["ms"] for r in rows)
    print(json.dumps({
        "metric": "dequant_matmul_weight_bandwidth",
        "value": round(agg, 1), "unit": "GB/s",
        "vs_baseline": round(agg / peak, 3),
        "config": {"model": args.model_id, "w_bits": args.w_bits,
                   "tokens": args.tokens, "peak_gbps": peak},
        "shapes": rows,
    }))
    return 0


if __name__ == "__main__":
    main()
