"""Serving soak: mixed-length / mixed-temperature / EOS-enabled requests
through the continuous-batching engine, interleaving submission with
Engine.step() — a production-robustness check beyond the fixed-shape
benchmarks.  Verifies every request completes within its budget and the
page allocator returns to its initial free count (no leaked or
double-freed pages across admission / speculation / mid-chunk
retirement).

Run from the repo root on the attached TPU:
    python scripts/serve_soak.py
r5 result (committed artifacts/serve_soak_r05.txt): 512/512 requests,
pages balanced.
"""
import time

import numpy as np

from tgq.utils.jax_setup import setup_jax

setup_jax()

from tgq.cli.serve import load_or_make_model  # noqa: E402
from tgq.serve import Engine, ServeConfig     # noqa: E402


class _Args:
    checkpoint = None
    model_id = "qwen3-8b"
    w_bits = 4
    group_size = 128
    lm_head_bits = 8


def main(n_requests: int = 512) -> None:
    params, cfg, _ = load_or_make_model(_Args())
    scfg = ServeConfig(max_slots=128, page_size=64, num_pages=128 * 8 + 1,
                       max_pages_per_slot=8, max_new_tokens=64, kv_bits=8,
                       a_bits=8, decode_chunk=16, eos_id=7,
                       prefill_chunk_tokens=4096)
    eng = Engine(params, cfg, scfg)
    free0 = eng.pt.num_free
    rng = np.random.default_rng(0)
    reqs = []
    t0 = time.time()
    for i in range(n_requests):
        plen = int(rng.integers(8, 384))
        prompt = rng.integers(0, cfg.vocab_size, size=plen).tolist()
        temp = float(rng.choice([0.0, 0.0, 0.0, 0.8]))
        mnt = int(rng.integers(4, 64))
        reqs.append(eng.submit(prompt, max_new_tokens=mnt,
                               temperature=temp))
        if i % 16 == 15:  # interleave submission with engine ticks
            eng.step()
    while not eng.idle:
        eng.step()
    wall = time.time() - t0
    done = sum(r.done for r in reqs)
    toks = sum(len(r.output) for r in reqs)
    bad = [r.rid for r in reqs
           if not r.output or len(r.output) > r.max_new_tokens]
    print(f"soak: {done}/{n_requests} done, {toks} tokens in {wall:.1f}s "
          f"({toks / wall:.0f} tok/s overall), bad {bad[:5]}")
    assert done == n_requests and not bad
    assert eng.pt.num_free == free0, (eng.pt.num_free, free0)
    print("PAGES BALANCED; SOAK OK")


if __name__ == "__main__":
    main()
