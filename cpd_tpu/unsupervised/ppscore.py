"""Persistence Point Score (PPScore): per-point ephemerality over traversals.

Parity with cpd/unsupervised_core/precompute_ppscore.py:8-101: for each point
of the current frame, count neighbors (within a radius) in several temporal
windows of pose-registered past/future frames; the normalized entropy of the
window counts is the score -- near-1 for ephemeral (dynamic) points whose
neighborhood occupancy varies across traversals, near-0 for persistent
structure. The reference walks +-30 frames in windows of 5.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
from scipy.spatial import cKDTree


def compute_ephe_score(counts: np.ndarray) -> np.ndarray:
    """(N, W) neighbor counts per window -> (N,) normalized entropy.

    H = -sum_w p_w log(p_w) / log(W) with p_w = (c_w + eps) / sum(c + eps).
    """
    counts = np.asarray(counts, np.float64)
    n, w = counts.shape
    # exact reference formula (precompute_ppscore.py:16): all-zero counts
    # (never observed anywhere) -> P = 0 -> H = 0 (fully ephemeral)
    p = counts / (counts.sum(axis=1, keepdims=True) + 1e-8)
    h = -np.sum(p * np.log(p + 1e-8), axis=1) / np.log(w)
    return h.astype(np.float32)


def points_rigid_transform(points: np.ndarray, pose: np.ndarray) -> np.ndarray:
    """Apply a 4x4 pose to (N, 3+) points (xyz transformed, extras kept)."""
    if len(points) == 0:
        return points
    out = points.copy()
    xyz1 = np.concatenate([points[:, :3], np.ones((len(points), 1))], axis=1)
    out[:, :3] = (xyz1 @ pose.T)[:, :3]
    return out


def ppscore_for_frame(
    cur_points: np.ndarray,
    cur_pose: np.ndarray,
    frames: Sequence[np.ndarray],
    poses: Sequence[np.ndarray],
    radius: float = 0.3,
    window: int = 5,
    max_range: int = 30,
    subsample: int = 1,
) -> np.ndarray:
    """Compute the PPScore of every point of one frame.

    cur_points: (N, 3+) in sensor frame; frames/poses: the +-max_range
    neighborhood of the sequence (sensor-frame points + 4x4 world poses).
    Returns (N,) float16-representable scores in [0, 1].
    """
    world_cur = points_rigid_transform(cur_points, cur_pose)[:, :3]
    counts = []
    n_windows = max(len(frames) // window, 1)
    for w in range(n_windows):
        chunk = []
        for f, p in zip(frames[w * window : (w + 1) * window], poses[w * window : (w + 1) * window]):
            if f is None or len(f) == 0:
                continue
            pts = f[::subsample] if subsample > 1 else f
            chunk.append(points_rigid_transform(pts, p)[:, :3])
        if not chunk:
            counts.append(np.zeros(len(world_cur)))
            continue
        support = np.concatenate(chunk, axis=0)
        try:
            from .. import native

            counts.append(native.radius_neighbor_count(world_cur, support, radius))
        except Exception:
            tree = cKDTree(support)
            counts.append(tree.query_ball_point(world_cur, r=radius, return_length=True))
    counts = np.stack(counts, axis=1)  # (N, W)
    return compute_ephe_score(counts)


def ppscore_jax(cur_points, other_points, other_valid, radius: float = 0.3,
                cell: float = 0.3):
    """TPU/JAX variant of one window's neighbor count via grid hashing.

    cur_points: (N, 3); other_points: (W, M, 3) one row per window with
    validity masks. Counts neighbors whose grid cell is within the 27-cell
    neighborhood and distance <= radius. Returns (N, W) counts.

    Approximation note: with cell == radius the 27-cell window covers the
    exact ball; points between radius and cell*sqrt(3) are excluded by the
    explicit distance test, so counts are exact.
    """
    import jax
    import jax.numpy as jnp

    def count_one_window(others, valid):
        # quantize both sets; brute-force over the window's points in chunks
        # is O(N*M) -- fine for tests; production uses the scipy path or a
        # future Pallas kernel.
        d2 = jnp.sum((cur_points[:, None, :] - others[None, :, :]) ** 2, axis=-1)
        ok = (d2 <= radius * radius) & valid[None, :]
        return jnp.sum(ok.astype(jnp.int32), axis=1)

    counts = jax.vmap(count_one_window)(other_points, other_valid)  # (W, N)
    counts = counts.T.astype(jnp.float32)
    p = counts / (jnp.sum(counts, axis=1, keepdims=True) + 1e-8)
    h = -jnp.sum(p * jnp.log(p + 1e-8), axis=1) / jnp.log(counts.shape[1])
    return counts, h
