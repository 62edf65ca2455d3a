"""Lightweight timing/observability harness.

The reference has no tracing beyond ad-hoc `Instant` prints in examples
(SURVEY.md §5). This provides: a host-sync-correct timer (block_until_ready
is not a reliable barrier through remote device tunnels — a host read is),
a bootstraps/sec counter (the framework's north-star metric), and an
optional jax.profiler trace context for real TPU runs.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


def force(x) -> None:
    """Host-read barrier: guarantees all queued device work has finished."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))


@dataclass
class Timer:
    """Accumulates named wall-clock spans with device synchronization."""

    spans: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            force(sync_on)
        self.spans.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for name, ts in self.spans.items():
            lines.append(
                f"{name}: n={len(ts)} total={sum(ts):.3f}s "
                f"mean={np.mean(ts) * 1e3:.1f}ms min={min(ts) * 1e3:.1f}ms"
            )
        return "\n".join(lines)


def gate_throughput(gate_fn, a, b, ck, iters: int = 3) -> float:
    """Bootstrapped gates/sec: chained iterations (output feeds back as
    input, defeating any same-input result caching), one host barrier."""
    out = gate_fn(a, b, ck)
    force(out)
    t0 = time.perf_counter()
    cur = a
    for _ in range(iters):
        cur = gate_fn(cur, b, ck)
    force(cur)
    per_iter = (time.perf_counter() - t0) / iters
    return a.shape[0] / per_iter


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rs_tfhe_trace"):
    """jax.profiler trace context (view with tensorboard). May be unsupported
    on tunneled devices; failures are swallowed so benches keep running."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
