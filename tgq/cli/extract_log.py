"""Post-hoc log miner (reference extract_log.py): scans run directories
for quantization.log files, extracts per-module relative prediction
errors, aggregates mean/max per layer-type per run → multi_run_summary.csv.
"""
from __future__ import annotations

import argparse
import collections
import csv
import os
import re

# pipeline log line:  "   mlp.down_proj  | rank  123 | rel_err 0.0414 | 1.23s"
LINE_RE = re.compile(
    r"\s+(?P<name>[\w.]+)\s+\|\s+rank\s+(?P<rank>\S+)\s+\|\s+rel_err\s+"
    r"(?P<err>[\d.naif]+)\s+\|"
)


def mine_log(path: str) -> dict[str, list[float]]:
    per_type: dict[str, list[float]] = collections.defaultdict(list)
    with open(path) as f:
        for line in f:
            m = LINE_RE.search(line)
            if not m:
                continue
            try:
                err = float(m.group("err"))
            except ValueError:
                continue
            if err == err:  # not nan
                per_type[m.group("name").split(".")[-1]].append(err)
    return per_type


def main(argv=None) -> int:
    from tgq.utils.jax_setup import setup_jax

    setup_jax()
    ap = argparse.ArgumentParser()
    ap.add_argument("roots", nargs="+", help="run directories to scan")
    ap.add_argument("--out", default="multi_run_summary.csv")
    args = ap.parse_args(argv)

    rows = []
    for root in args.roots:
        for dirpath, _, files in os.walk(root):
            if "quantization.log" not in files:
                continue
            per_type = mine_log(os.path.join(dirpath, "quantization.log"))
            for mod, errs in sorted(per_type.items()):
                rows.append({
                    "run": os.path.relpath(dirpath),
                    "module": mod,
                    "n": len(errs),
                    "mean_rel_err": sum(errs) / len(errs),
                    "max_rel_err": max(errs),
                })
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["run", "module", "n", "mean_rel_err", "max_rel_err"]
        )
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}")
    return 0


if __name__ == "__main__":
    main()
