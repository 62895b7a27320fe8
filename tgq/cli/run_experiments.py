"""ε grid sweep (reference run_experiments.py): log-grid of truncation
thresholds × bit-widths; writes tuning_results/final_results.csv."""
from __future__ import annotations

import argparse
import csv
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
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--solver", default="eigh", choices=["eigh", "pchol"])
    ap.add_argument("--eps_grid", default="1e-7,1e-6,1e-5,1e-4,1e-3,1e-2")
    ap.add_argument("--out", default="tuning_results")
    ap.add_argument("--attn_impl", default="auto")
    args = ap.parse_args(argv)

    eps_values = [float(e) for e in args.eps_grid.split(",")]
    bit_configs = [(4, True), (3, True), (4, False), (3, False), (2, False)]

    base = ["--model_id", args.model_id, "--dataset", args.dataset,
            "--n_samples", str(args.n_samples), "--seq_len", str(args.seq_len),
            "--batch_size", str(args.batch_size), "--group_size",
            str(args.group_size), "--attn_impl", args.attn_impl, "--no_save"]

    os.makedirs(args.out, exist_ok=True)
    rows = []
    fields = ["name", "status", "ppl", "time_s"]
    for bits, sym in bit_configs:
        for eps in eps_values:
            exp = {
                "name": f"W{bits}_{'Sym' if sym else 'Asym'}_eps{eps:g}",
                "mode": args.solver, "w_bits": bits, "sym": sym,
                "eps": eps, "threshold_method": "energy",
            }
            rows.append(run_experiment(exp, base, args.out))
            with open(os.path.join(args.out, "final_results.csv"), "w",
                      newline="") as f:
                w = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
                w.writeheader()
                w.writerows(rows)
    print(json.dumps(rows, indent=2, default=str))
    return 0


if __name__ == "__main__":
    main()
