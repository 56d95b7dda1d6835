"""Tracing / profiling hooks — an aux subsystem the reference lacks
(SURVEY.md §5: only wall-clock epoch timers, `modelUnet.py:856,945`).

`trace_steps` captures a jax.profiler trace (TensorBoard-viewable) of a
few training steps; `StepTimer` gives per-step wall/percentile stats with
the explicit host-fetch sync this stack needs; `dump_hlo` writes the
optimized HLO of a jitted function for compiler-level inspection.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional

import numpy as np


def trace_steps(trainer, loader, out_dir: str, n_steps: int = 3):
    import jax

    os.makedirs(out_dir, exist_ok=True)
    trainer._build_steps()
    it = iter(loader)
    batch = trainer._put(next(it))
    # compile outside the trace
    trainer.state, m = trainer._train_step(trainer.state, batch)
    _ = float(m["loss"])
    with jax.profiler.trace(out_dir):
        for _ in range(n_steps):
            batch = trainer._put(next(it))
            trainer.state, m = trainer._train_step(trainer.state, batch)
        _ = float(m["loss"])
    print(f"[profiling] trace written to {out_dir}")


class StepTimer:
    """Wall-clock step statistics with proper queue-drain sync."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            float(np.asarray(sync_value).reshape(-1)[0])  # drain device queue
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        t = np.asarray(self.times)
        if len(t) == 0:
            return {}
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps_per_sec": float(1.0 / t.mean()),
        }


def dump_hlo(fn: Callable, *example_args, path: Optional[str] = None) -> str:
    """Optimized HLO text of `fn` jitted on `example_args`."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    txt = lowered.compile().as_text()
    if path:
        with open(path, "w") as f:
            f.write(txt)
    return txt
