"""Hermetic low-bit quality trend: trained-tiny-model e2e PPL.

Produces the container-scale analogue of the reference's published
benchmark table (README.md:29-41, final_benchmark.csv): per bit-width
(W4/W3/W2), per method (pchol / eigh / gptq / rtn), the end-to-end
perplexity delta of the quantized model — on a tiny Qwen3-architecture
model TRAINED on a synthetic Markov source (tgq.calib.tiny_train).  A
random-init model cannot produce this table: its logits are flat and
every quantizer's PPL delta is noise.

Usage:
  python -m tgq.cli.tiny_quality_bench [--steps 300] [--bits 4,3,2]
"""
from __future__ import annotations

import argparse
import copy
import csv
import json


def main(argv=None) -> int:
    from tgq.utils.jax_setup import setup_jax

    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_id", default="tiny-qwen3")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--bits", default="4,3,2")
    ap.add_argument("--methods", default="pchol,eigh,gptq,rtn")
    ap.add_argument("--eps", type=float, default=1e-5)
    ap.add_argument("--group_size", type=int, default=32)
    ap.add_argument("--n_calib", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="CSV output path")
    args = ap.parse_args(argv)

    from tgq.calib import QuantizeConfig, quantize_model
    from tgq.calib.tiny_train import sample_stream, train_tiny
    from tgq.eval import perplexity_from_token_stream
    from tgq.models.config import PRESETS

    cfg = PRESETS[args.model_id]
    params, probs, loss = train_tiny(cfg, steps=args.steps, seed=args.seed)
    calib = sample_stream(probs, args.n_calib * 64, seed=7).reshape(
        args.n_calib, 64)
    eval_ids = sample_stream(probs, 4096, seed=99)

    def ppl_of(p):
        return perplexity_from_token_stream(
            p, cfg, eval_ids, max_length=64, stride=32, attn_impl="naive")

    base = ppl_of(params)
    print(f"trained base ppl {base:.4f} (uniform bound {cfg.vocab_size}; "
          f"train loss {loss:.3f})")
    rows = []
    for bits in (int(b) for b in args.bits.split(",")):
        for mode in args.methods.split(","):
            kw = {}
            if mode in ("pchol", "eigh", "svd"):
                kw["eps"] = args.eps
            elif mode == "gptq":
                kw["actorder"] = True
            qcfg = QuantizeConfig(mode=mode, w_bits=bits,
                                  group_size=args.group_size, batch_size=4,
                                  block_size=32, attn_impl="naive", **kw)
            p, _, _ = quantize_model(copy.deepcopy(params), cfg, calib, qcfg)
            ppl = ppl_of(p)
            rows.append({"bits": bits, "method": mode,
                         "ppl": round(float(ppl), 4),
                         "delta": round(float(ppl - base), 4)})
            print(f"W{bits} {mode:6s} ppl {ppl:.4f} (d {ppl - base:+.4f})")

    if args.out:
        with open(args.out, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=["bits", "method", "ppl",
                                               "delta"])
            w.writeheader()
            w.writerows(rows)
    print(json.dumps({"base_ppl": round(float(base), 4), "rows": rows}))
    return 0


if __name__ == "__main__":
    main()
