"""Logging, seeding, and run utilities (parity: cpd/utils/common_utils.py)."""
from __future__ import annotations

import json
import logging
import random
import time
from pathlib import Path

import numpy as np


def enable_compile_cache(path: str = "~/.cache/jax_comp") -> None:
    """Turn on JAX's persistent compilation cache (works under the axon
    tunnel too: measured 14 s -> 1 s warm restart for a small program; the
    big sparse-conv programs save minutes per process start). Safe to call
    multiple times; honors an explicit JAX_COMPILATION_CACHE_DIR env."""
    import os

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser(path))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # read-only fs / unsupported backend: run uncached
        logging.getLogger("cpd_tpu").warning("compile cache disabled: %s", e)


def create_logger(log_file=None, rank: int = 0, name: str = "cpd_tpu"):
    """File+console logger, rank-0 only to console (common_utils.py:85)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setFormatter(fmt)
        logger.addHandler(console)
    if log_file is not None and not any(
        isinstance(h, logging.FileHandler) for h in logger.handlers
    ):
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed: int = 666):
    """Seed host RNGs (common_utils.py:101); device randomness is explicit
    through jax.random keys derived from the same seed."""
    random.seed(seed)
    np.random.seed(seed)
    return seed


class MetricsLogger:
    """Structured metrics: JSONL always; TensorBoard via tf.summary when TF
    is importable (replaces tensorboardX usage, train_utils.py:57)."""

    def __init__(self, out_dir, enable_tb: bool = True):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.out_dir / "metrics.jsonl", "a")
        self.tb = None
        if enable_tb:
            try:
                import tensorflow as tf

                self.tb = tf.summary.create_file_writer(str(self.out_dir / "tensorboard"))
            except Exception:
                self.tb = None

    def log(self, step: int, metrics: dict):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def close(self):
        self.jsonl.close()


class PhaseTimer:
    """First-class per-phase timing (the tracing subsystem the reference lacks,
    SURVEY.md section 5). Use as ``with timer.phase("data"): ...``; read
    ``timer.summary()`` for mean seconds per phase."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    class _Ctx:
        def __init__(self, timer, name):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            dt = time.perf_counter() - self.t0
            t = self.timer
            t.totals[self.name] = t.totals.get(self.name, 0.0) + dt
            t.counts[self.name] = t.counts.get(self.name, 0) + 1

    def phase(self, name: str):
        return self._Ctx(self, name)

    def summary(self):
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}
