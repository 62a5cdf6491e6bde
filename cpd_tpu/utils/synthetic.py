"""Lidar-realistic synthetic frames for benchmarks and cap audits.

A spinning lidar concentrates returns on surfaces: the ground disk with
~1/r range density (fixed beam elevations), object faces with ~1/r^2 point
counts, and vertical clutter (walls, poles). A uniform random box fill is
the WRONG density model -- it occupies far more distinct voxels at depth
than any real frame, saturating downsample-stage caps that real Waymo
frames never approach (the reference caps its grids the same way:
cpd/datasets/processor/data_processor.py voxelization with MAX_NUMBER_OF_VOXELS
150000 on frames that occupy ~60-90k).

Geometry is Waymo-flavored: range +-75 m, ground at z ~= 0, objects are
car/pedestrian/cyclist-sized boxes with points on their lidar-visible faces.
"""
from __future__ import annotations

import numpy as np


def make_lidar_frame(rng: np.random.Generator, n_points: int = 200_000,
                     r_max: float = 74.0, n_objects: int = 80,
                     n_walls: int = 24, extra_feats: int = 2):
    """Returns (points (n_points, 3 + extra_feats) float32, valid (n_points,) bool).

    Split: ~55% ground disk (p(r) ~ 1/r), ~30% object surfaces
    (count ~ 1/r^2 per object), ~15% vertical clutter planes/poles.
    """
    n_ground = int(n_points * 0.55)
    n_obj = int(n_points * 0.30)
    n_clutter = n_points - n_ground - n_obj
    pts = []

    # ground disk: r sampled log-uniform (beam-elevation density ~ 1/r)
    r_min = 2.5
    u = rng.random(n_ground)
    r = r_min * (r_max / r_min) ** u
    az = rng.uniform(0, 2 * np.pi, n_ground)
    gx = r * np.cos(az)
    gy = r * np.sin(az)
    # gentle terrain slope + per-ring noise
    gz = (0.01 * gx + 0.02 * np.sin(gy * 0.05)
          + rng.normal(0, 0.04, n_ground))
    pts.append(np.stack([gx, gy, gz], axis=1))

    # objects: boxes on the ground; visible faces get ~1/r^2 of the budget
    sizes = np.array([
        [4.6, 2.0, 1.7],   # vehicle
        [0.8, 0.8, 1.8],   # pedestrian
        [1.8, 0.8, 1.7],   # cyclist
    ])
    cls = rng.integers(0, 3, n_objects)
    obj_r = r_min + (r_max - 8.0) * rng.random(n_objects) ** 1.5
    obj_az = rng.uniform(0, 2 * np.pi, n_objects)
    ox = obj_r * np.cos(obj_az)
    oy = obj_r * np.sin(obj_az)
    heading = rng.uniform(0, 2 * np.pi, n_objects)
    w_obj = 1.0 / np.maximum(obj_r, 5.0) ** 2
    counts = np.maximum((w_obj / w_obj.sum() * n_obj).astype(int), 8)
    # trim/grow to exactly n_obj
    diff = n_obj - counts.sum()
    counts[0] += diff
    for i in range(n_objects):
        c = max(int(counts[i]), 4)
        dx, dy, dz = sizes[cls[i]] * rng.uniform(0.9, 1.15, 3)
        # two visible vertical faces + partial roof, in box frame
        face = rng.integers(0, 3, c)
        bx = np.where(face == 0, -dx / 2,
                      rng.uniform(-dx / 2, dx / 2, c))
        by = np.where(face == 1, -dy / 2,
                      rng.uniform(-dy / 2, dy / 2, c))
        bz = np.where(face == 2, dz, rng.uniform(0, dz, c))
        bx += rng.normal(0, 0.02, c)
        by += rng.normal(0, 0.02, c)
        ch, sh = np.cos(heading[i]), np.sin(heading[i])
        wx = ox[i] + ch * bx - sh * by
        wy = oy[i] + sh * bx + ch * by
        wz = bz + rng.normal(0, 0.02, c)
        pts.append(np.stack([wx, wy, wz], axis=1))

    # clutter: vertical wall segments and poles (buildings, signs, trees)
    per_wall = n_clutter // n_walls if n_walls else 0
    for i in range(n_walls):
        c = per_wall if i < n_walls - 1 else n_clutter - per_wall * (n_walls - 1)
        wr = r_min + (r_max - 5.0) * rng.random() ** 1.2
        waz = rng.uniform(0, 2 * np.pi)
        cx, cy = wr * np.cos(waz), wr * np.sin(waz)
        if rng.random() < 0.3:  # pole
            t = rng.random(c)
            wx = cx + rng.normal(0, 0.05, c)
            wy = cy + rng.normal(0, 0.05, c)
            wz = t * rng.uniform(2.0, 3.9)
        else:  # wall segment
            length = rng.uniform(4.0, 20.0)
            ang = rng.uniform(0, 2 * np.pi)
            t = rng.uniform(-length / 2, length / 2, c)
            wx = cx + np.cos(ang) * t + rng.normal(0, 0.03, c)
            wy = cy + np.sin(ang) * t + rng.normal(0, 0.03, c)
            wz = rng.uniform(0, 3.9, c) ** 1.2  # denser near ground
        pts.append(np.stack([wx, wy, wz], axis=1))

    xyz = np.concatenate(pts, axis=0)[:n_points].astype(np.float32)
    feats = rng.uniform(0, 1, (xyz.shape[0], extra_feats)).astype(np.float32)
    out = np.concatenate([xyz, feats], axis=1)
    perm = rng.permutation(out.shape[0])
    return out[perm], np.ones(out.shape[0], bool)
