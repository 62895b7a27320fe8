"""Process-wide JAX runtime setup shared by every CLI entry point.

The single biggest usability cost on TPU is compile time: XLA traces and
compiles each distinct (shape, config) program once per *process*, and a
cold compile of the serving step or a solver program takes tens of
seconds.  The reference side-steps this by running long-lived processes;
our CLIs are short-lived, so we turn on JAX's persistent compilation
cache keyed under the user's cache dir (override with TGQ_CACHE_DIR,
disable with TGQ_CACHE_DIR="").
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Idempotent: safe to call from every entry point."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("TGQ_CACHE_DIR")
    if cache_dir is None:
        root = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        cache_dir = os.path.join(root, "tgq", "jax")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program, even fast-compiling ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
