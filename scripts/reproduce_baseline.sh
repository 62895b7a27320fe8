#!/usr/bin/env bash
# Reproduce the reference's published Qwen3-8B benchmark table
# (BASELINE.md) and diff the PPLs row by row.
#
# Requirements (not available in the build container — no network):
#   * a local Qwen3-8B HF checkpoint directory (safetensors + tokenizer),
#     or an HF id resolvable from a local HF cache
#   * local HF datasets cache holding wikitext-2-raw-v1 (train + test)
#
# Usage:
#   scripts/reproduce_baseline.sh <model_dir_or_hf_id> [out_dir]
#   scripts/reproduce_baseline.sh --smoke        # synthetic self-test
#
# Accepted tolerance (see scripts/diff_baseline.py): per-row
# |ppl - ref| <= max(0.15, 2%·ref); the TruncGPTQ<=GPTQ orderings must
# hold regardless.  Expected in-tolerance drift sources: bf16 weights
# (reference fp16), TPU flash-attention accumulation order.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--smoke" ]]; then
  # hermetic smoke: tiny model + synthetic data; checks the harness
  # mechanics and method orderings, not reference-PPL parity
  OUT=${2:-/tmp/baseline_smoke}
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m tgq.cli.run_benchmark \
    --model_id tiny-qwen3 --dataset synthetic --n_samples 4 --seq_len 64 \
    --batch_size 2 --group_size -1 --solver pchol --attn_impl naive \
    --out "$OUT"
  # mechanics only: on a tiny random model, Trunc-vs-GPTQ differences
  # are noise — the ordering claim is checked on the real reproduction
  python scripts/diff_baseline.py "$OUT/final_benchmark.csv" \
    --skip_reference_check --skip_ordering_check
  exit $?
fi

MODEL=${1:?usage: reproduce_baseline.sh <model_dir_or_hf_id> [out_dir]}
OUT=${2:-baseline_repro}

# the exact reference configuration (BASELINE.md): 128x2048 wikitext2
# calibration samples seed 42, group 128 static groups, strided PPL
python -m tgq.cli.run_benchmark \
  --model_id "$MODEL" --dataset wikitext2 \
  --n_samples 128 --seq_len 2048 --batch_size 8 --group_size 128 \
  --solver pchol --out "$OUT"

python scripts/diff_baseline.py "$OUT/final_benchmark.csv"
