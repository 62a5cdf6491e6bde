"""Multihost collective helpers (the commu_utils / merge_results_dist parity).

Replaces the reference's torch.distributed plumbing (cpd/utils/commu_utils.py:
all_gather via byte tensors, reduce_dict, average_reduce_value; cpd/utils/
common_utils.py:175 merge_results_dist via pickle tmpdir + barriers) with
jax process APIs: on a multi-host TPU pod use
``multihost_utils.process_allgather``; single-process falls through.
"""
from __future__ import annotations

import pickle
import time
from pathlib import Path
from typing import Any, Dict, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def synchronize():
    """Barrier across hosts (commu_utils.synchronize parity)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("cpd_tpu_sync")


def all_gather_arrays(x: np.ndarray) -> List[np.ndarray]:
    """Gather a (same-shape) host array from every process."""
    if jax.process_count() == 1:
        return [np.asarray(x)]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return list(np.asarray(gathered))


def average_reduce_value(v: float) -> float:
    """Mean of a scalar across processes (commu_utils.average_reduce_value)."""
    vals = all_gather_arrays(np.asarray([v], np.float64))
    return float(np.mean([x[0] for x in vals]))


def reduce_dict(d: Dict[str, float], average: bool = True) -> Dict[str, float]:
    keys = sorted(d)
    vec = np.asarray([float(d[k]) for k in keys], np.float64)
    parts = all_gather_arrays(vec)
    agg = np.mean(parts, axis=0) if average else np.sum(parts, axis=0)
    return dict(zip(keys, agg.tolist()))


def merge_results_dist(part_list: List[Any], size: int, tmpdir) -> List[Any]:
    """Merge per-host python results via the filesystem (common_utils.py:175
    parity: pickle per rank + barrier + rank-0 concat, truncated to ``size``)."""
    rank, world = get_rank(), get_world_size()
    tmpdir = Path(tmpdir)
    tmpdir.mkdir(parents=True, exist_ok=True)
    with open(tmpdir / f"result_part_{rank}.pkl", "wb") as f:
        pickle.dump(part_list, f)
    synchronize()
    if rank != 0:
        return []
    parts = []
    for r in range(world):
        p = tmpdir / f"result_part_{r}.pkl"
        for _ in range(600):
            if p.exists():
                break
            time.sleep(0.1)
        with open(p, "rb") as f:
            parts.append(pickle.load(f))
    # round-robin interleave (the eval sampler strides ranks)
    merged: List[Any] = []
    for i in range(max(len(x) for x in parts)):
        for r in range(world):
            if i < len(parts[r]):
                merged.append(parts[r][i])
    return merged[:size]
