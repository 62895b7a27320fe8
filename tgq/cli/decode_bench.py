"""Decode-step component attribution microbenchmark.

Times each component of the serving decode step in isolation at real
serving shapes — fused paged-attention kernel, the layer-stacked
dequant matmuls, the packed lm_head, the batched KV write, sampling —
with the slope method (t(2N) − t(N) of chained in-jit reps), which
cancels the remote-attached chip's fixed dispatch+fetch overhead and
survives its early-returning ``block_until_ready``.

Every input is passed as a jit argument (never closure-captured: a
captured pool becomes a multi-GB compile-time constant).  This is the
tool that produced the serving optimization history in RESULTS.md.

Usage:
  python -m tgq.cli.decode_bench --model_id qwen3-8b --slots 128 \
      --context 256 --page_size 64
"""
from __future__ import annotations

import argparse
import functools
import json
import time


def _slope(fn, n: int) -> float:
    """Seconds per unit rep of ``fn(reps)`` (fn must force a fetch)."""
    fn(n)
    fn(2 * n)
    t0 = time.time()
    fn(n)
    t1 = time.time()
    fn(2 * n)
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


def main(argv=None) -> int:
    from tgq.utils.jax_setup import setup_jax

    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_id", default="qwen3-8b")
    ap.add_argument("--w_bits", type=int, default=4)
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--slots", type=int, default=128)
    ap.add_argument("--context", type=int, default=256)
    ap.add_argument("--page_size", type=int, default=64)
    ap.add_argument("--kv_bits", type=int, default=8, choices=(16, 8, 4))
    ap.add_argument("--a_bits", type=int, default=16, choices=(16, 8),
                    help="activation precision for the packed matmuls")
    ap.add_argument("--lm_head_bits", type=int, default=8, choices=(16, 8))
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--skip_components", action="store_true",
                    help="measure only the composed decode_steps path")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tgq.core.quant import QuantSpec
    from tgq.models.causal_lm import apply_linear, lm_logits
    from tgq.models.config import PRESETS
    from tgq.models.hf_import import init_packed_params
    from tgq.serve.decode import (_sample_tokens, _slice_layer,
                                  fuse_packed_projections,
                                  stack_layer_params)
    from tgq.serve.kv_cache import PagedKVCache, kv_write_token_all

    cfg = PRESETS[args.model_id]
    spec = QuantSpec(bits=args.w_bits, group_size=args.group_size, sym=False)
    slots, page = args.slots, args.page_size
    mpps = -(-args.context // page)
    npages = slots * mpps + 1

    params = init_packed_params(cfg, spec, seed=0,
                                lm_head_bits=args.lm_head_bits)
    if args.a_bits == 8:
        from tgq.serve.engine import _mark_act_bits

        params, _ = _mark_act_bits(params, 8)
    params = stack_layer_params(fuse_packed_projections(params))
    layers = params["model"]["layers"]
    jax.block_until_ready(jax.tree.leaves(layers)[0])

    cache = PagedKVCache.init(cfg, npages, page, kv_bits=args.kv_bits)
    table = jnp.arange(1, 1 + slots * mpps, dtype=jnp.int32).reshape(
        slots, mpps)
    lens = jnp.full((slots,), args.context, jnp.int32)
    pos = lens - 1
    results = {}

    if args.skip_components:
        return _composed_only(args, cfg, params, cache, table, lens, pos,
                              results)

    # ---- fused paged attention x layers ---------------------------------
    from tgq.kernels.paged_attention import paged_decode_attention

    @functools.partial(jax.jit, static_argnames="reps")
    def attn_many(q, k, v, ks, vs, lens, reps):
        def step(q, _):
            def layer(li, q):
                a = paged_decode_attention(q, k, v, ks, vs, li, lens, table,
                                           num_kv_heads=cfg.num_kv_heads)
                return q + a * 1e-6
            return jax.lax.fori_loop(0, cfg.num_layers, layer, q), None
        q, _ = jax.lax.scan(step, q, None, length=reps)
        return q[0, 0, 0]

    q0 = jax.random.normal(jax.random.key(1),
                           (slots, cfg.num_heads, cfg.head_dim),
                           jnp.float32) * 0.1
    a = (q0, cache.k, cache.v, cache.ks, cache.vs, lens)
    dt = _slope(lambda n: float(attn_many(*a, n)), args.reps)
    results["attention_ms"] = round(dt * 1e3, 2)
    print(f"[decode_bench] attention x{cfg.num_layers}: {dt*1e3:7.2f} ms/step",
          flush=True)

    # ---- weight matmuls x layers ----------------------------------------
    @functools.partial(jax.jit, static_argnames="reps")
    def mm_many(layers, h, reps):
        def body(li, h):
            L = li % cfg.num_layers
            lp = _slice_layer(layers, L)
            sa, mlp = lp["self_attn"], lp["mlp"]
            qkv = apply_linear(sa["qkv_proj"], h, layer=L)
            q, k, v = jnp.split(
                qkv, [cfg.q_size, cfg.q_size + cfg.kv_size], axis=-1)
            o = apply_linear(sa["o_proj"], q, layer=L)
            gu = apply_linear(mlp["gate_up_proj"], h, layer=L)
            g, u = jnp.split(gu, 2, axis=-1)
            d = apply_linear(mlp["down_proj"], jax.nn.silu(g) * u, layer=L)
            return (h + o * 1e-6 + d * 1e-6
                    + (jnp.sum(k) + jnp.sum(v)).astype(h.dtype) * 1e-12)
        return jax.lax.fori_loop(0, reps * cfg.num_layers, body, h)[0, 0]

    h0 = jax.random.normal(jax.random.key(2), (slots, cfg.hidden_size),
                           jnp.bfloat16)
    dt = _slope(lambda n: float(mm_many(layers, h0, n)), args.reps // 2 or 1)
    results["matmuls_ms"] = round(dt * 1e3, 2)
    print(f"[decode_bench] matmuls x{cfg.num_layers}:   {dt*1e3:7.2f} ms/step",
          flush=True)

    # ---- lm_head ----------------------------------------------------------
    @functools.partial(jax.jit, static_argnames="reps")
    def head_many(params, x, reps):
        def body(_, x):
            lg = lm_logits(params, cfg, x)
            return x + (jnp.sum(lg) * 1e-12).astype(x.dtype)
        return jax.lax.fori_loop(0, reps, body, x)[0, 0, 0]

    x0 = jax.random.normal(jax.random.key(3), (slots, 1, cfg.hidden_size),
                           jnp.bfloat16)
    dt = _slope(lambda n: float(head_many(params, x0, n)), args.reps)
    results["lm_head_ms"] = round(dt * 1e3, 2)
    print(f"[decode_bench] lm_head:       {dt*1e3:7.2f} ms/step", flush=True)

    # ---- batched KV write ---------------------------------------------------
    kv = jax.random.normal(
        jax.random.key(4),
        (cfg.num_layers, slots, cfg.num_kv_heads, cfg.head_dim), jnp.float32)
    pages = table[jnp.arange(slots), pos // page]
    offs = pos % page

    @functools.partial(jax.jit, static_argnames="reps", donate_argnums=(0,))
    def kvw_many(c, reps):
        def body(i, c):
            return kv_write_token_all(c, pages, offs, kv, kv)
        return jax.lax.fori_loop(0, reps, body, c)

    state = {"c": cache}

    def run_kvw(n):
        state["c"] = kvw_many(state["c"], n)
        return float(state["c"].k[0, 0, 0, 0])

    dt = _slope(run_kvw, args.reps)
    results["kv_write_ms"] = round(dt * 1e3, 2)
    print(f"[decode_bench] kv_write(all): {dt*1e3:7.2f} ms/step", flush=True)
    cache = state["c"]

    # ---- sampling -----------------------------------------------------------
    temps = jnp.zeros((slots,), jnp.float32)
    lg0 = jax.random.normal(jax.random.key(5), (slots, cfg.vocab_size),
                            jnp.float32)

    @functools.partial(jax.jit, static_argnames="reps")
    def samp_many(lg0, key, reps):
        def body(i, carry):
            lg, k = carry
            t, k = _sample_tokens(lg, temps, k)
            return lg + t[:, None] * 1e-9, k
        lg, _ = jax.lax.fori_loop(0, reps, body, (lg0, jax.random.key(0)))
        return lg[0, 0]

    dt = _slope(lambda n: float(samp_many(lg0, None, n)), args.reps)
    results["sampling_ms"] = round(dt * 1e3, 2)
    print(f"[decode_bench] sampling:      {dt*1e3:7.2f} ms/step", flush=True)

    return _composed_only(args, cfg, params, cache, table, lens, pos,
                          results)


def _composed_only(args, cfg, params, cache, table, lens, pos, results):
    """Composed decode step through the production decode_steps path —
    slope over the fused-chunk length (decode_steps(n) vs 2n) cancels
    dispatch+fetch; components are isolation numbers, this is the
    ground truth."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tgq.serve.decode import decode_steps

    slots, page = args.slots, args.page_size
    temps_all = jnp.zeros((slots,), jnp.float32)
    toks0 = jnp.ones((slots,), jnp.int32)
    key0 = jax.random.key(0)
    # leave chunk headroom: place lens mid-context so lens+2*reps stays
    # within the table
    lens_c = jnp.full((slots,), max(args.context - 2 * args.reps - 1, 1),
                      jnp.int32)
    state = {"c": cache, "k": key0}

    def run_steps(n):
        toks, state["c"], state["k"] = decode_steps(
            params, state["c"], cfg, table, lens_c + 1, toks0, lens_c,
            temps_all, state["k"], n, "kernel", greedy_only=True)
        return int(np.asarray(toks)[-1, 0])

    dt = _slope(run_steps, args.reps)
    results["composed_ms"] = round(dt * 1e3, 2)
    print(f"[decode_bench] composed step:  {dt*1e3:7.2f} ms/step "
          f"({slots / dt:.0f} tok/s)", flush=True)

    config = {"model": args.model_id, "slots": slots,
              "context": args.context, "page_size": page,
              "w_bits": args.w_bits, "kv_bits": args.kv_bits,
              "a_bits": args.a_bits, "lm_head_bits": args.lm_head_bits}
    has_components = any(k != "composed_ms" for k in results)
    if has_components:
        total = sum(v for k, v in results.items() if k != "composed_ms")
        print(json.dumps({
            "metric": "decode_step_component_ms",
            "value": round(total, 2), "unit": "ms",
            "config": config, "components": results,
        }))
    else:
        # --skip_components: a component total of 0 would be a
        # misleading record — emit the composed number as its own metric
        print(json.dumps({
            "metric": "decode_step_composed_ms",
            "value": results["composed_ms"], "unit": "ms",
            "config": config,
        }))
    return 0


if __name__ == "__main__":
    main()
