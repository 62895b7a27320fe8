"""Minimal 2-run harness (reference run_baseline.py): FP baseline PPL +
GPTQ-4bit with actorder."""
from __future__ import annotations

import argparse
import json
import os

from tgq.cli.run_benchmark import run_experiment


def main(argv=None) -> int:
    from tgq.utils.jax_setup import setup_jax

    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_id", default="qwen3-8b")
    ap.add_argument("--dataset", default="wikitext2")
    ap.add_argument("--n_samples", type=int, default=128)
    ap.add_argument("--seq_len", type=int, default=2048)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--out", default="baseline_results")
    ap.add_argument("--attn_impl", default="auto")
    args = ap.parse_args(argv)

    base = ["--model_id", args.model_id, "--dataset", args.dataset,
            "--n_samples", str(args.n_samples), "--seq_len", str(args.seq_len),
            "--batch_size", str(args.batch_size), "--group_size",
            str(args.group_size), "--attn_impl", args.attn_impl, "--no_save"]
    os.makedirs(args.out, exist_ok=True)
    rows = [
        run_experiment({"name": "FP_Baseline", "mode": "baseline"}, base, args.out),
        run_experiment({"name": "GPTQ_4bit", "mode": "gptq", "w_bits": 4,
                        "actorder": True}, base, args.out),
    ]
    print(json.dumps(rows, indent=2, default=str))
    return 0


if __name__ == "__main__":
    main()
