"""Tracing / profiling helpers (SURVEY.md §5 build item).

The reference has wall-clock deltas only; here phase timers feed the
same ``layer_stats`` schema, and a ``jax.profiler`` device trace can be
wrapped around any region (viewable in TensorBoard / Perfetto).
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

logger = logging.getLogger(__name__)


class PhaseTimers:
    """Accumulating named wall-clock timers.

    ``sync=True`` drains all device work before closing each phase so
    per-phase attribution is honest (async dispatch otherwise charges
    everything to whichever phase syncs first) — at the cost of
    serializing the pipeline; leave off except when profiling.  A plain
    ``block_until_ready`` can return early through a remote-attached
    chip, so sync is a tiny host transfer.
    """

    def __init__(self, sync: bool = False):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            if self.sync:
                import numpy as np
                import jax.numpy as jnp

                # a TPU core runs programs in dispatch order, so fetching
                # a freshly dispatched no-op drains everything before it
                _ = np.asarray(jnp.zeros(()) + 1.0)
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_s": round(v / max(self.counts[k], 1), 4)}
            for k, v in sorted(self.totals.items())
        }

    def log_summary(self) -> None:
        for k, v in self.summary().items():
            logger.info("[timing] %-24s total %8.2fs  n=%4d  mean %7.3fs",
                        k, v["total_s"], v["count"], v["mean_s"])


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace of the enclosed region (no-op if dir is None)."""
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("[profile] device trace written to %s", trace_dir)
