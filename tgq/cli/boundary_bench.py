"""Measure the per-kernel-boundary cost of the decode step's matmuls.

r4's trace attribution (artifacts/decode_attribution_r04.txt) charges
the composed decode's +2.7 ms over the component floor to "pipeline
fill/drain across 145 custom calls/step".  This bench measures the
marginal cost of one extra pallas_call boundary directly: the same
dequant-matmul work executed as 1, 2, 4, or 8 kernel calls over
out-column slices — identical FLOPs, identical weight traffic, only the
call count changes.  The slope of time vs splits is the per-boundary
fill/drain cost; × 36 layers it prices the fused-kernel levers
(qkv+o sharing, gate_up+down fusion, o-in-attention) BEFORE building
them (r4 VERDICT directive #2).

Slope-timed (t(2N)−t(N)) through a fori_loop with a data dependency so
the ~30 ms tunnel dispatch overhead cancels (see verify skill).

Usage: python -m tgq.cli.boundary_bench [--tokens 128] [--reps 32]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


SHAPES = {  # qwen3-8b decode matmuls (in, out)
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gate_up": (4096, 24576),
    "down": (12288, 4096),
}


def _make_packed(rng, n, m, bits, group):
    import jax.numpy as jnp

    from tgq.core.packing import PackedLinear
    from tgq.core.quant import QuantSpec

    q = rng.integers(0, 2 ** bits, size=(m, n), dtype=np.int32)
    ng = n // group
    scale = (rng.random((m, ng)) * 0.02 + 0.005).astype(np.float32)
    zero = np.full((m, ng), float(2 ** (bits - 1)), np.float32)
    spec = QuantSpec(bits=bits, group_size=group, sym=False)
    return PackedLinear.from_codes(jnp.asarray(q), jnp.asarray(scale),
                                   jnp.asarray(zero), spec)


def _split_out(w, parts: int):
    """Slice a PackedLinear into ``parts`` out-column blocks (lane axis
    slices of codes/scale/zero — groups run along in_features, exact)."""
    import dataclasses

    m = w.out_features
    step = m // parts
    out = []
    for i in range(parts):
        sl = slice(i * step, (i + 1) * step)
        out.append(dataclasses.replace(
            w, codes=w.codes[:, sl], scale=w.scale[:, sl],
            zero=w.zero[:, sl], out_features=step))
    return out


def main(argv=None) -> int:
    from tgq.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from tgq.kernels.dequant_matmul import quantized_matmul

    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--splits", default="1,2,4,8")
    ap.add_argument("--shapes", default="qkv,o,gate_up,down")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    t = args.tokens
    results = {}
    for name in args.shapes.split(","):
        n, m = SHAPES[name]
        w = _make_packed(rng, n, m, args.bits, args.group_size)
        x = jnp.asarray(rng.standard_normal((t, n)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        per_split = {}
        for parts in (int(s) for s in args.splits.split(",")):
            ws = _split_out(w, parts)

            @functools.partial(jax.jit, static_argnames=("reps",))
            def many(x, reps: int, ws=tuple(ws)):
                def body(_, carry):
                    x = carry
                    ys = [quantized_matmul(x, wi, impl="pallas",
                                           out_dtype=jnp.bfloat16)
                          for wi in ws]
                    # data dependency without changing x's magnitude
                    fb = sum(jnp.sum(y[0, :1]) for y in ys)
                    return x + (fb * 1e-12).astype(x.dtype)

                return jax.lax.fori_loop(0, reps, body, x)[0, 0].astype(
                    jnp.float32)

            _ = float(many(x, args.reps))
            _ = float(many(x, 2 * args.reps))
            slopes = []
            for _a in range(4):
                t0 = time.time()
                _ = float(many(x, args.reps))
                t_n = time.time() - t0
                t0 = time.time()
                _ = float(many(x, 2 * args.reps))
                t_2n = time.time() - t0
                slopes.append((t_2n - t_n) / args.reps)
            slopes.sort()
            dt = slopes[len(slopes) // 2]
            per_split[parts] = dt
            print(f"[boundary] {name:8s} splits {parts}  "
                  f"{dt * 1e3:7.3f} ms/iter", flush=True)
        # least-squares slope of time vs (parts-1): per-boundary cost
        ks = sorted(per_split)
        xs = np.array([k - 1 for k in ks], float)
        ys = np.array([per_split[k] for k in ks], float)
        slope = float(np.polyfit(xs, ys, 1)[0]) if len(ks) > 1 else 0.0
        results[name] = {
            "per_split_ms": {k: round(v * 1e3, 3)
                             for k, v in per_split.items()},
            "per_boundary_us": round(slope * 1e6, 1),
        }
        print(f"[boundary] {name:8s} per-boundary {slope * 1e6:6.1f} us")
    print(json.dumps({"tokens": t, "bits": args.bits, "results": results}))
    return 0


if __name__ == "__main__":
    main()
