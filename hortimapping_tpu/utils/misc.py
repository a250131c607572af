"""Seeding, timing, and experiment-logging helpers.

Reference: `set_random_seed` (`/root/reference/wild_completion/utils.py:638-641`),
`get_time` (`utils.py:614-619` — wall clock behind a CUDA sync), and
`setup_wandb` (`utils.py:622-635`).
"""

from __future__ import annotations

import getpass
import os
import time
from typing import Dict, List, Optional


def set_random_seed(seed: int) -> None:
    """Seed numpy + python hashing; JAX randomness is explicit-key so no
    global state exists to seed (pass `jax.random.PRNGKey(seed)` instead).
    Every entry point calls this with 42, like the reference
    (`test_wild_completion.py:32`)."""
    import random

    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))


def get_time() -> float:
    """Wall time with all pending device work drained.

    The reference syncs the CUDA stream before reading the clock
    (`utils.py:614-619`); the JAX analog is draining dispatched async work.
    """
    try:
        import jax

        jax.effects_barrier()
    except Exception:
        pass
    return time.time()


class Timer:
    """Per-phase accumulator matching the reference's t1..t6 LM-loop timing
    printout contract (`optimizer.py:91-195,263-266`)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._t0: Optional[float] = None
        self._phase: Optional[str] = None

    def start(self, phase: str) -> None:
        self._phase = phase
        self._t0 = get_time()

    def stop(self) -> float:
        dt = get_time() - self._t0
        self.totals[self._phase] = self.totals.get(self._phase, 0.0) + dt
        self.counts[self._phase] = self.counts.get(self._phase, 0) + 1
        return dt

    def summary(self) -> str:
        return ", ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}x" for k, v in self.totals.items()
        )


class trace_if_enabled:
    """Context manager: capture a `jax.profiler` trace when the env var
    `HORTI_PROFILE_DIR` is set (viewable in TensorBoard / Perfetto). The
    reference's only tracing was wall-clock prints behind CUDA syncs
    (`utils.py:614-619`); this is the TPU-native equivalent, off by default
    so it never perturbs the hot path."""

    def __init__(self, label: str = "horti"):
        self.dir = os.environ.get("HORTI_PROFILE_DIR")
        self.label = label

    def __enter__(self):
        if self.dir:
            import jax

            jax.profiler.start_trace(os.path.join(self.dir, self.label))
        return self

    def __exit__(self, *exc):
        if self.dir:
            import jax

            jax.profiler.stop_trace()
        return False


def setup_wandb() -> None:
    """Cache the W&B API key in `<user>_wandb.key` and log in, exactly like
    the reference (`utils.py:622-635`). No-op (with a notice) when the
    `wandb` package is unavailable — runs proceed without remote logging."""
    try:
        import wandb  # noqa: F401
    except ImportError:
        print("wandb not installed; remote logging disabled")
        return
    key_path = getpass.getuser() + "_wandb.key"
    if not os.path.exists(key_path):
        key = input("wandb api key (from https://wandb.ai/authorize): ")
        with open(key_path, "w") as f:
            f.write(key)
    else:
        print("wandb api key loaded from", key_path)
    with open(key_path) as f:
        os.environ["WANDB_API_KEY"] = f.read().rstrip()


def wandb_log_summary(project: str, run_name: str, summary: Dict, enabled: bool) -> None:
    """One summary dict per run (ref: `run_shape_completion_challenge.py:272-277`)."""
    if not enabled:
        return
    try:
        import wandb
    except ImportError:
        return
    run = wandb.init(project=project, name=run_name)
    run.summary.update(summary)
    run.finish()


def mean_or_nan(xs: List[float]) -> float:
    import numpy as np

    return float(np.mean(xs)) if xs else float("nan")
