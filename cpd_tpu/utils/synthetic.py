"""Lidar-realistic synthetic frames for benchmarks and cap audits.

A spinning lidar samples the world on a (beam elevation) x (azimuth step)
grid: ~64 beams, ~2650 azimuth steps/rev. Two consequences matter for
sparse-voxel occupancy statistics:

* Ground returns form RINGS (one per downward beam, radius h/tan(-elev))
  of azimuth-contiguous points -- at 0.1 m voxels, consecutive samples land
  in the same or adjacent voxels, so downsampling DILATES the active set
  far less than independently-scattered points would (a strided 3^3/s2
  sparse conv maps an isolated voxel to up to 8 output cells, but a
  contiguous arc only to ~arc/2 + 1 cells per level).
* Surfaces (object faces, walls) are sampled on contiguous az x elev
  patches, not salt-and-pepper.

An earlier version of this generator drew ground azimuth i.i.d. uniform;
that inflated the measured down2 occupancy ABOVE the stage-0 count
(>160k from 126k occupied), which no real frame does (reference Waymo
profiles have x_conv2 ~= 0.8x x_conv1). Benchmarks and cap audits built on
that model would force oversized caps. Beam-structured sampling restores
realistic dilation; the cap audit in bench.py is calibrated against it.

Geometry is Waymo-flavored: range +-75 m, sensor at z ~= 2 m, ground at
z ~= 0, objects are car/pedestrian/cyclist-sized boxes with points on
their lidar-visible faces.
"""
from __future__ import annotations

import numpy as np

SENSOR_H = 2.0          # Waymo roof lidar height (m)
AZ_STEPS = 2650         # azimuth samples per revolution (~0.136 deg)


def _ground_rings(rng, n_ground, r_min, r_max):
    """Beam-structured ground returns: one ring per downward beam.

    Beam elevations are spaced uniformly in angle (real top lidars are
    denser near the horizon -- approximated by uniform + the natural
    1/tan radius crowding at far range). Each ring carries a full
    azimuth-contiguous revolution; the beam count is chosen so the total
    matches the budget.
    """
    # rings out to r_max: elevation from steep (-35 deg) to graze
    graze = np.arctan(SENSOR_H / r_max)
    n_beams = max(4, int(np.ceil(n_ground / AZ_STEPS)))
    elev = np.linspace(np.deg2rad(35.0), graze, n_beams)  # downward angles
    radii = SENSOR_H / np.tan(elev)
    radii = np.clip(radii, r_min, r_max)
    az = (np.arange(AZ_STEPS) + 0.5) / AZ_STEPS * 2 * np.pi
    pts = []
    budget = n_ground
    for r0 in radii:
        c = min(AZ_STEPS, budget)
        if c <= 0:
            break
        budget -= c
        a = az[:c] + rng.uniform(0, 2 * np.pi)  # random ring phase
        rr = r0 + rng.normal(0, 0.03, c)        # range noise
        gx = rr * np.cos(a)
        gy = rr * np.sin(a)
        gz = (0.01 * gx + 0.02 * np.sin(gy * 0.05)
              + rng.normal(0, 0.03, c))
        pts.append(np.stack([gx, gy, gz], axis=1))
    out = np.concatenate(pts, axis=0) if pts else np.zeros((0, 3))
    if out.shape[0] < n_ground:  # pad by resampling (budget overrun guard)
        extra = out[rng.integers(0, max(out.shape[0], 1), n_ground - out.shape[0])]
        out = np.concatenate([out, extra], axis=0)
    return out[:n_ground]


def _surface_patch(rng, origin_xy, normal_az, width, height, r, count,
                   z0=0.0):
    """Points on a vertical surface patch sampled on the az x elev scan grid.

    Horizontal sample spacing at range r is r * (2pi / AZ_STEPS); vertical
    spacing is r * beam spacing (~0.33 deg). The patch is filled in
    contiguous scan order and truncated to ``count``.
    """
    haz = r * (2 * np.pi / AZ_STEPS)            # horizontal step (m)
    hel = r * np.deg2rad(0.33)                  # vertical step (m)
    nu = max(2, int(width / max(haz, 1e-3)))
    nv = max(2, int(height / max(hel, 1e-3)))
    u = (np.arange(nu) - nu / 2) * haz
    v = z0 + (np.arange(nv) + 0.5) * hel
    uu, vv = np.meshgrid(u, v, indexing="ij")
    uu = uu.ravel()[:count]
    vv = vv.ravel()[:count]
    c = uu.shape[0]
    tx, ty = -np.sin(normal_az), np.cos(normal_az)  # tangent of the surface
    wx = origin_xy[0] + tx * uu + rng.normal(0, 0.02, c)
    wy = origin_xy[1] + ty * uu + rng.normal(0, 0.02, c)
    wz = vv + rng.normal(0, 0.02, c)
    return np.stack([wx, wy, wz], axis=1)


def make_lidar_frame(rng: np.random.Generator, n_points: int = 200_000,
                     r_max: float = 74.0, n_objects: int = 80,
                     n_walls: int = 24, extra_feats: int = 2):
    """Returns (points (n_points, 3 + extra_feats) float32, valid (n_points,) bool).

    Split: ~55% ground rings (beam-structured), ~30% object surfaces
    (az x elev patches, count ~ 1/r^2 per object), ~15% vertical clutter
    (walls and poles on the scan grid).
    """
    n_ground = int(n_points * 0.55)
    n_obj = int(n_points * 0.30)
    n_clutter = n_points - n_ground - n_obj
    r_min = 2.5
    pts = [_ground_rings(rng, n_ground, r_min, r_max)]

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
    counts[0] += n_obj - counts.sum()
    for i in range(n_objects):
        c = max(int(counts[i]), 4)
        dx, dy, dz = sizes[cls[i]] * rng.uniform(0.9, 1.15, 3)
        # two visible vertical faces, sampled as scan-grid patches
        c1 = c // 2
        face1 = _surface_patch(rng, (ox[i], oy[i]), heading[i], dx, dz,
                               max(obj_r[i], r_min), c1)
        face2 = _surface_patch(rng, (ox[i], oy[i]), heading[i] + np.pi / 2,
                               dy, dz, max(obj_r[i], r_min), c - c1)
        pts.append(face1)
        pts.append(face2)

    # clutter: vertical wall segments and poles (buildings, signs, trees)
    per_wall = n_clutter // n_walls if n_walls else 0
    for i in range(n_walls):
        c = per_wall if i < n_walls - 1 else n_clutter - per_wall * (n_walls - 1)
        wr = r_min + (r_max - 5.0) * rng.random() ** 1.2
        waz = rng.uniform(0, 2 * np.pi)
        cx, cy = wr * np.cos(waz), wr * np.sin(waz)
        if rng.random() < 0.3:  # pole: a thin tall patch
            pts.append(_surface_patch(rng, (cx, cy), waz, 0.25,
                                      rng.uniform(2.0, 3.9), wr, c))
        else:  # wall segment
            length = rng.uniform(4.0, 20.0)
            pts.append(_surface_patch(rng, (cx, cy), rng.uniform(0, 2 * np.pi),
                                      length, rng.uniform(2.5, 3.9), wr, c))

    xyz = np.concatenate(pts, axis=0)[:n_points].astype(np.float32)
    if xyz.shape[0] < n_points:  # patch truncation underrun: repeat samples
        extra = xyz[rng.integers(0, xyz.shape[0], n_points - xyz.shape[0])]
        xyz = np.concatenate([xyz, extra], axis=0)
    feats = rng.uniform(0, 1, (xyz.shape[0], extra_feats)).astype(np.float32)
    out = np.concatenate([xyz, feats], axis=1)
    perm = rng.permutation(out.shape[0])
    return out[perm], np.ones(out.shape[0], bool)
