"""CLI pipeline driver (reference quantize.py re-designed TPU-native).

Same external contract as the reference: flag surface (tgq.cli.args),
stdout/file logging, results.json with {config, layer_stats, metrics},
crash_log.json on failure.  Differences by design: models are first-party
JAX (preset/random or local HF import), the quantized checkpoint is
packed INT (plus the fake-quant eval in-process), and mode "pchol" runs
the TPU-native fast solver.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    from tgq.utils.jax_setup import setup_jax

    setup_jax()
    from tgq.cli.args import get_args
    from tgq.utils import setup_logging

    args = get_args(argv)
    setup_logging(args.save_path)
    log = logging.getLogger("tgq.quantize")

    log.info("=" * 20 + " INITIALIZING QUANTIZATION " + "=" * 20)
    log.info("Model:  %s", args.model_id)
    log.info("Mode:   %s", args.mode.upper())
    log.info("Params: Bits=%d, Group=%d, Eps=%g", args.w_bits, args.group_size, args.eps)

    if args.device == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    from tgq.calib import QuantizeConfig, quantize_model
    from tgq.calib.data import get_loaders, load_eval_tokens
    from tgq.core.checkpoint import save_quantized
    from tgq.eval import perplexity_from_token_stream
    from tgq.models.hf_import import resolve_model

    experiment_log = {"config": vars(args), "layer_stats": [], "metrics": {}}

    params, cfg, tokenizer = resolve_model(args.model_id, seed=args.seed)
    if args.seq_len != cfg.seqlen:
        cfg = dataclasses.replace(cfg, seqlen=args.seq_len)

    def eval_ppl(p):
        if args.dataset == "synthetic" or tokenizer is None:
            tokens = load_eval_tokens("synthetic", None, vocab_size=cfg.vocab_size)
        else:
            tokens = load_eval_tokens("wikitext2", tokenizer)
        pad = 0
        if tokenizer is not None:
            pad = tokenizer.pad_token_id or tokenizer.eos_token_id or 0
        return perplexity_from_token_stream(
            p, cfg, tokens, max_length=cfg.seqlen, stride=512,
            pad_token_id=pad, attn_impl=args.attn_impl,
        )

    if args.mode == "baseline":
        log.info("BASELINE EVALUATION")
        ppl = eval_ppl(params)
        log.info("Baseline PPL: %.4f", ppl)
        experiment_log["metrics"]["baseline_ppl"] = ppl
        os.makedirs(args.save_path, exist_ok=True)
        with open(os.path.join(args.save_path, "results.json"), "w") as f:
            json.dump(experiment_log, f, indent=4)
        return 0

    log.info("Loading dataset: %s", args.dataset)
    input_ids = get_loaders(
        args.dataset, tokenizer, args.n_samples, args.seq_len,
        seed=args.seed, vocab_size=cfg.vocab_size,
    )

    qcfg = QuantizeConfig(
        mode=args.mode, w_bits=args.w_bits, group_size=args.group_size,
        sym=args.sym, eps=args.eps, threshold_method=args.threshold_method,
        actorder=args.actorder, damp_percent=args.damp_percent,
        adaptive_eps=args.adaptive_eps, sketch_ratio=args.sketch_ratio,
        batch_size=args.batch_size, block_size=args.block_size,
        kernel_backend=args.kernel_backend, precision=args.precision,
        attn_impl=args.attn_impl, pack=not args.no_pack, seed=args.seed,
    )

    t0 = time.time()
    if args.mode == "test":
        from tgq.calib.pipeline import spectral_consistency_check

        experiment_log["spectral_check"] = spectral_consistency_check(
            params, cfg, input_ids, qcfg
        )
    else:
        from tgq.utils.profiling import device_trace

        with device_trace(args.profile_dir):
            params, packed, run_log = quantize_model(
                params, cfg, input_ids, qcfg, resume_dir=args.resume_dir)
        experiment_log["layer_stats"] = run_log["layer_stats"]
        experiment_log["metrics"].update(run_log["metrics"])

        kv_eq = None
        if args.kv_equalize:
            from tgq.serve.kv_calibrate import estimate_kv_equalizers

            log.info("Calibrating per-channel KV equalizers "
                     "(tgq.serve.kv_calibrate)")
            kv_eq = estimate_kv_equalizers(
                params, cfg, input_ids[: min(4, len(input_ids))],
                attn_impl=args.attn_impl)
        if not args.no_save:
            log.info("Saving packed checkpoint to %s", args.save_path)
            save_quantized(args.save_path, params, packed, cfg,
                           dataclasses.asdict(qcfg), kv_equalizers=kv_eq)
        if args.hf_export:
            from tgq.models.hf_export import export_hf

            hf_dir = os.path.join(args.save_path, "hf")
            log.info("Exporting HF-format checkpoint to %s", hf_dir)
            try:
                export_hf(hf_dir, params, cfg, tokenizer=tokenizer)
            except NotImplementedError as e:
                log.warning("HF export skipped: %s", e)

    total = time.time() - t0
    log.info("Total processing time: %.2f minutes", total / 60)

    if args.mode != "test":
        log.info("Running final evaluation...")
        ppl = eval_ppl(params)
        log.info("Final Quantized PPL: %.4f", ppl)
        # merge — the pipeline already populated metrics (phase_timing etc.)
        experiment_log["metrics"].update(
            {"total_time": total, "quantized_ppl": ppl})

    os.makedirs(args.save_path, exist_ok=True)
    with open(os.path.join(args.save_path, "results.json"), "w") as f:
        json.dump(experiment_log, f, indent=4, default=str)
    return 0


def run() -> None:
    try:
        sys.exit(main())
    except Exception as e:  # crash handler (reference quantize.py:288-294)
        logging.error("CRASH: %s", e)
        with open("crash_log.json", "w") as f:
            json.dump({"error": str(e)}, f)
        raise


if __name__ == "__main__":
    run()
