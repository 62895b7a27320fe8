"""KV-quantization quality harness (VERDICT r1 item 6).

Measures decode-attention output error introduced by each KV storage
format as a function of context length, through the *real* cache path
(kv_write_pages → kv_gather): synthetic K/V with the channel-outlier
structure observed in trained LLMs (per-channel lognormal amplitudes +
a few extreme channels), a random query, softmax attention in f32.

Formats: int8 / int4, each with and without static per-channel
equalizers (oracle profiles from the same distribution — what
tgq.serve.kv_calibrate estimates from calibration data).  bf16 storage
is the ~0 reference.

Usage:
  python -m tgq.cli.kv_quality [--out artifacts/kv_quality.json]
Prints one JSON line per (format, context); writes the full table.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def _attention(q, kg, vg, n_ctx):
    """f32 reference attention: q (nq, kvh, d); kg/vg (tokens, kvh, d)
    → (nq, kvh, d).  Multiple random queries average out the
    variance of the softmax-winner positions (a single query makes the
    error metric noisy across contexts)."""
    import jax.numpy as jnp

    k = kg[:n_ctx].astype(jnp.float32)
    v = vg[:n_ctx].astype(jnp.float32)
    logits = jnp.einsum("qhd,thd->qht", q, k) / np.sqrt(q.shape[-1])
    p = jnp.exp(logits - logits.max(axis=-1, keepdims=True))
    p = p / p.sum(axis=-1, keepdims=True)
    return jnp.einsum("qht,thd->qhd", p, v)


def run(contexts, kv_heads=8, head_dim=128, page_size=64, seed=0,
        outlier_channels=4, outlier_gain=10.0, sigma=0.8):
    import jax.numpy as jnp

    from tgq.models.config import ModelConfig
    from tgq.serve.kv_cache import PagedKVCache, kv_gather, kv_write_pages

    rng = np.random.default_rng(seed)
    fused = kv_heads * head_dim
    n_max = max(contexts)
    n_pages = n_max // page_size

    # channel-outlier amplitude profiles (lognormal + hard outliers)
    def profile():
        a = np.exp(rng.normal(0.0, sigma, fused)).astype(np.float32)
        hot = rng.choice(fused, outlier_channels, replace=False)
        a[hot] *= outlier_gain
        return a

    a_k, a_v = profile(), profile()
    k_raw = (rng.standard_normal((n_max, fused)).astype(np.float32)
             * a_k).reshape(n_max, kv_heads, head_dim)
    v_raw = (rng.standard_normal((n_max, fused)).astype(np.float32)
             * a_v).reshape(n_max, kv_heads, head_dim)
    q = jnp.asarray(rng.standard_normal((16, kv_heads, head_dim)),
                    jnp.float32)

    # oracle equalizers = the true per-channel RMS, mean-1 per head
    # (kv_calibrate.estimate_kv_equalizers recovers these from data)
    def eq_of(a):
        e = a.reshape(kv_heads, head_dim)
        e = e / e.mean(axis=-1, keepdims=True)
        return np.maximum(e.reshape(-1), 1e-3)

    cfg = ModelConfig(name="kvq", vocab_size=1, hidden_size=fused,
                      intermediate_size=1, num_layers=1,
                      num_heads=kv_heads, num_kv_heads=kv_heads,
                      head_dim=head_dim)
    kj = jnp.asarray(k_raw)
    vj = jnp.asarray(v_raw)
    pages = jnp.arange(1, n_pages + 1)

    ref = {n: _attention(q, kj, vj, n) for n in contexts}
    rows = []
    for bits in (8, 4):
        for use_eq in (False, True):
            kw = {}
            if use_eq:
                kw = dict(k_eq=eq_of(a_k)[None], v_eq=eq_of(a_v)[None])
            cache = PagedKVCache.init(cfg, n_pages + 1, page_size,
                                      kv_bits=bits, **kw)
            cache = kv_write_pages(cache, 0, pages, kj, vj)
            kg, vg = kv_gather(cache, 0, pages[None],
                               dtype=jnp.float32)
            for n in contexts:
                out = _attention(q, kg[0], vg[0], n)
                err = float(np.linalg.norm(np.asarray(out - ref[n]))
                            / np.linalg.norm(np.asarray(ref[n])))
                rows.append({"format": f"int{bits}" + ("+eq" if use_eq
                                                       else ""),
                             "context": n, "rel_err": round(err, 6)})

    # KIVI-style per-channel-per-page K scales on top of the equalizers
    # (simulated math, mirroring the page layout) — measured to decide
    # whether the dynamic per-channel scheme earns a production format.
    # Verdict (see RESULTS.md): the static equalizers already capture
    # the channel structure, so this adds only ~4% at int4, and the V
    # path alone (per-token int4+eq, the KIVI V-side default) exceeds
    # the 0.05 target — INT4 KV stays documented-experimental.
    ke, ve = eq_of(a_k), eq_of(a_v)
    k_eqd = (k_raw.reshape(n_max, fused) / ke)
    kp = k_eqd.reshape(n_max // page_size, page_size, fused)
    s = np.maximum(np.abs(kp).max(axis=1) / 7.0, 1e-10)  # (pages, fused)
    kq = np.clip(np.round(kp / s[:, None, :]), -7, 7) * s[:, None, :]
    k_kchan = jnp.asarray((kq.reshape(n_max, fused) * ke)
                          .reshape(n_max, kv_heads, head_dim))
    v_eqd = v_raw.reshape(n_max, kv_heads, head_dim) / ve.reshape(
        kv_heads, head_dim)
    sv = np.maximum(np.abs(v_eqd).max(axis=-1) / 7.0, 1e-10)
    vq = np.clip(np.round(v_eqd / sv[..., None]), -7, 7) * sv[..., None]
    v_tok = jnp.asarray(vq * ve.reshape(kv_heads, head_dim))
    for n in contexts:
        out = _attention(q, k_kchan, v_tok, n)
        err = float(np.linalg.norm(np.asarray(out - ref[n]))
                    / np.linalg.norm(np.asarray(ref[n])))
        rows.append({"format": "int4+eq+kchan(sim)", "context": n,
                     "rel_err": round(err, 6)})
        # floor: K exact, V per-token int4+eq — no K-side scheme can
        # bring the total under this
        out = _attention(q, kj, v_tok, n)
        err = float(np.linalg.norm(np.asarray(out - ref[n]))
                    / np.linalg.norm(np.asarray(ref[n])))
        rows.append({"format": "int4 V-only floor(sim)", "context": n,
                     "rel_err": round(err, 6)})
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contexts", type=str, default="128,512,2048,8192")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    contexts = [int(c) for c in args.contexts.split(",")]

    rows = run(contexts, seed=args.seed)
    for r in rows:
        print(json.dumps(r))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"config": {"contexts": contexts, "seed": args.seed},
                       "rows": rows}, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
