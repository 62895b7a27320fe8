"""CLI surface tests: flag parity, end-to-end runs on tiny models,
benchmark runner table, log mining."""
import json
import os

import numpy as np
import pytest


TINY_ARGS = [
    "--model_id", "tiny-qwen3", "--dataset", "synthetic",
    "--n_samples", "4", "--seq_len", "64", "--batch_size", "2",
    "--group_size", "-1", "--block_size", "32", "--attn_impl", "naive",
]


def test_flag_surface_matches_reference():
    """Every reference CLI flag must exist with the same default."""
    from tgq.cli.args import build_parser

    p = build_parser()
    defaults = {a.dest: a.default for a in p._actions}
    # reference utils.py:31-130
    assert defaults["model_id"] == "Qwen/Qwen3-8B"
    assert defaults["seed"] == 42
    assert defaults["dataset"] == "wikitext2"
    assert defaults["n_samples"] == 128
    assert defaults["seq_len"] == 2048
    assert defaults["batch_size"] == 8
    assert defaults["w_bits"] == 4
    assert defaults["group_size"] == -1
    assert defaults["sym"] is False
    assert defaults["eps"] == 1e-2
    assert defaults["sketch_ratio"] == 4.0
    assert defaults["threshold_method"] == "mean_trimmed"
    assert defaults["actorder"] is False
    assert defaults["damp_percent"] == 0.01
    assert defaults["adaptive_eps"] is False
    assert defaults["save_path"] == "./output"
    assert defaults["no_save"] is False


def test_cli_quantize_e2e(tmp_path):
    from tgq.cli.quantize import main

    out = str(tmp_path / "out")
    rc = main(TINY_ARGS + ["--mode", "pchol", "--w_bits", "4",
                           "--eps", "1e-7", "--save_path", out])
    assert rc == 0
    res = json.load(open(os.path.join(out, "results.json")))
    assert np.isfinite(res["metrics"]["quantized_ppl"])
    # pipeline metrics must survive the final-eval merge (round-1 clobber bug)
    assert "phase_timing" in res["metrics"]
    assert "total_time" in res["metrics"]
    assert len(res["layer_stats"]) == 14
    assert os.path.exists(os.path.join(out, "weights.npz"))
    assert os.path.exists(os.path.join(out, "quantization.log"))


def test_cli_baseline_mode(tmp_path):
    from tgq.cli.quantize import main

    out = str(tmp_path / "base")
    rc = main(TINY_ARGS + ["--mode", "baseline", "--save_path", out])
    assert rc == 0
    res = json.load(open(os.path.join(out, "results.json")))
    assert np.isfinite(res["metrics"]["baseline_ppl"])


def test_cli_test_mode(tmp_path):
    from tgq.cli.quantize import main

    out = str(tmp_path / "testmode")
    rc = main(TINY_ARGS + ["--mode", "test", "--save_path", out, "--no_save"])
    assert rc == 0
    res = json.load(open(os.path.join(out, "results.json")))
    checks = res["spectral_check"]
    assert len(checks) == 4
    # sketch top singular value should estimate sqrt(max eig) within ~2x
    for c in checks:
        assert 0.4 < c["ratio"] < 2.5, c


def test_run_benchmark_table(tmp_path):
    from tgq.cli.run_benchmark import main

    out = str(tmp_path / "bench")
    rc = main(["--model_id", "tiny-qwen3", "--dataset", "synthetic",
               "--n_samples", "4", "--seq_len", "64", "--batch_size", "2",
               "--group_size", "-1", "--solver", "pchol", "--out", out,
               "--attn_impl", "naive",
               "--only", "FP16_Baseline,GPTQ_W4_Asym,Trunc_W4_Asym"])
    assert rc == 0
    import csv

    rows = list(csv.DictReader(open(os.path.join(out, "final_benchmark.csv"))))
    assert [r["name"] for r in rows] == ["FP16_Baseline", "GPTQ_W4_Asym",
                                        "Trunc_W4_Asym"]
    assert all(r["status"] == "OK" for r in rows)
    ppls = {r["name"]: float(r["ppl"]) for r in rows}
    # quantized PPLs track the fp baseline on the tiny synthetic model
    assert ppls["Trunc_W4_Asym"] < ppls["FP16_Baseline"] * 2.0


def test_extract_log(tmp_path):
    from tgq.cli.extract_log import main
    from tgq.cli.quantize import main as qmain

    out = str(tmp_path / "run1")
    qmain(TINY_ARGS + ["--mode", "pchol", "--w_bits", "4", "--eps", "1e-7",
                       "--save_path", out, "--no_save"])
    summary = str(tmp_path / "summary.csv")
    rc = main([str(tmp_path), "--out", summary])
    assert rc == 0
    import csv

    rows = list(csv.DictReader(open(summary)))
    mods = {r["module"] for r in rows}
    assert {"q_proj", "down_proj"} <= mods
    assert all(float(r["mean_rel_err"]) >= 0 for r in rows)


def test_reproduction_argv_parses_against_current_flags(tmp_path):
    """Keep the real-PPL reproduction warm (scripts/reproduce_baseline.sh):
    build EVERY published-table experiment's full quantize-CLI argv —
    without executing anything — and parse it against the current flag
    surface.  Flag drift (renames, removed defaults) fails here instead
    of on the day real weights become reachable."""
    from tgq.cli.args import build_parser
    from tgq.cli.run_benchmark import experiment_argv, experiment_list

    base = ["--model_id", "Qwen/Qwen3-8B", "--dataset", "wikitext2",
            "--n_samples", "128", "--seq_len", "2048",
            "--batch_size", "32", "--group_size", "128",
            "--attn_impl", "auto", "--no_save"]
    for solver in ("pchol", "eigh"):
        exps = experiment_list(solver)
        assert len(exps) == 11  # reference run_benchmark.py's table
        for exp in exps:
            argv = experiment_argv(exp, base, str(tmp_path))
            args = build_parser().parse_args(argv)
            assert args.mode == exp["mode"]
            if "w_bits" in exp:
                assert args.w_bits == exp["w_bits"]
            if "eps" in exp:
                assert args.eps == exp["eps"]
            assert args.sym == bool(exp.get("sym"))
            assert args.no_save and args.dataset == "wikitext2"
