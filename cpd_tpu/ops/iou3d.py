"""Rotated BEV / 3D box overlap and IoU in pure JAX.

TPU-native replacement for the reference's ~870-LoC CUDA component
``cpd/ops/iou3d_nms`` (iou3d_nms_kernel.cu: in-kernel Sutherland-Hodgman
polygon clipping; iou3d_nms_utils.py:67 ``boxes_iou3d_gpu`` adds z overlap).

Design: instead of sequential polygon clipping, we use the closed-form
convex-intersection construction that vectorizes cleanly:
the intersection polygon of two convex quads is spanned by (a) corners of A
inside B, (b) corners of B inside A, (c) the 16 edge-edge intersection
points. We compute all 24 candidates with validity masks (static shapes!),
sort by angle around the valid-point centroid, and take the shoelace area.
Everything is elementwise/VPU work that XLA fuses; the pairwise version is a
double vmap, giving an (N, M) overlap matrix in one fused kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import boxes_to_corners_bev

_EPS = 1e-8


def _cross2(o, a, b):
    """z-component of (a-o) x (b-o); positive if o->a->b turns counter-clockwise."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _points_in_convex_quad(pts, quad):
    """pts: (P, 2), quad: (4, 2) counter-clockwise -> (P,) bool."""
    nxt = jnp.roll(quad, -1, axis=0)  # (4, 2)
    # cross of each edge with each point
    cross = _cross2(quad[None, :, :], nxt[None, :, :], pts[:, None, :])  # (P, 4)
    return jnp.all(cross >= -_EPS, axis=1)


def _segment_intersections(a_quad, b_quad):
    """All 16 edge-edge intersection points of two quads.

    Returns pts (16, 2), valid (16,) bool.
    """
    p1 = a_quad  # (4, 2)
    p2 = jnp.roll(a_quad, -1, axis=0)
    q1 = b_quad
    q2 = jnp.roll(b_quad, -1, axis=0)
    # broadcast to (4, 4, 2): a-edge i vs b-edge j
    p1b, p2b = p1[:, None, :], p2[:, None, :]
    q1b, q2b = q1[None, :, :], q2[None, :, :]
    r = p2b - p1b
    s = q2b - q1b
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # (4, 4)
    qmp = q1b - p1b
    t_num = qmp[..., 0] * s[..., 1] - qmp[..., 1] * s[..., 0]
    u_num = qmp[..., 0] * r[..., 1] - qmp[..., 1] * r[..., 0]
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    valid = (
        (jnp.abs(denom) > _EPS)
        & (t >= -_EPS) & (t <= 1.0 + _EPS)
        & (u >= -_EPS) & (u <= 1.0 + _EPS)
    )
    pts = p1b + t[..., None] * r  # (4, 4, 2)
    return pts.reshape(16, 2), valid.reshape(16)


def _convex_area_from_candidates(pts, valid):
    """Area of the convex polygon spanned by the valid candidate points.

    pts: (K, 2), valid: (K,) bool. SORT-FREE: instead of ordering the points
    by angle (a per-pair argsort + gathers, which lower to slow scalar paths
    when vmapped over an (N, M) pair matrix), build the next-by-angle
    successor as a one-hot (K, K) matrix -- the hull edge i->j exists iff j
    minimizes the ccw angle gap from i -- and sum cross(p_i, p_j) through it.
    Pure elementwise/reduction work; the angle of each point gets an
    index-scaled epsilon so successors are unique even for coincident points
    (duplicates then sit adjacent in the cycle and contribute zero area).
    """
    k = pts.shape[0]
    num_valid = jnp.sum(valid.astype(jnp.int32))
    vf = valid.astype(pts.dtype)[:, None]
    centroid = jnp.sum(pts * vf, axis=0) / jnp.maximum(num_valid, 1).astype(pts.dtype)
    ang = jnp.arctan2(pts[:, 1] - centroid[1], pts[:, 0] - centroid[0])
    ang = ang + jnp.arange(k, dtype=pts.dtype) * 1e-6  # strict total order
    two_pi = 2.0 * jnp.pi
    # ccw gap from i to j in (0, 2pi]; invalid rows/cols excluded
    gap = jnp.mod(ang[None, :] - ang[:, None], two_pi)
    gap = jnp.where(gap <= 0.0, two_pi, gap)  # self/zero gap wraps fully
    pair_ok = valid[:, None] & valid[None, :]
    gap = jnp.where(pair_ok, gap, jnp.inf)
    succ = gap == jnp.min(gap, axis=1, keepdims=True)  # (K, K) one-hot rows
    succ = succ & pair_ok
    cross = pts[:, 0][:, None] * pts[:, 1][None, :] - pts[None, :, 0] * pts[:, 1][:, None]
    area2 = jnp.sum(jnp.where(succ, cross, 0.0))
    area = 0.5 * jnp.abs(area2)
    return jnp.where(num_valid >= 3, area, 0.0)


def _overlap_bev_single(corners_a, corners_b):
    """BEV overlap area of two quads given their (4, 2) ccw corners."""
    a_in_b = _points_in_convex_quad(corners_a, corners_b)  # (4,)
    b_in_a = _points_in_convex_quad(corners_b, corners_a)  # (4,)
    inter_pts, inter_valid = _segment_intersections(corners_a, corners_b)
    pts = jnp.concatenate([corners_a, corners_b, inter_pts], axis=0)  # (24, 2)
    valid = jnp.concatenate([a_in_b, b_in_a, inter_valid], axis=0)  # (24,)
    return _convex_area_from_candidates(pts, valid)


def _overlap_bev_clip(corners_a, corners_b):
    """BEV overlap via vectorized Sutherland-Hodgman clipping -- NO sorting.

    Clips quad A by B's 4 half-planes with a fixed 8-vertex capacity (a convex
    polygon gains at most one vertex per clip: 4 -> 8). Each pass emits, per
    slot, (intersection-if-crossing, point-if-inside) and compacts them with a
    cumsum scatter. NOTE: measured SLOWER than the candidate-sort method on
    TPU (per-pair scatter compaction dominates); kept as an independent
    implementation for correctness cross-checks.
    """
    cap = 8
    poly = jnp.zeros((cap, 2), corners_a.dtype).at[:4].set(corners_a)
    count = jnp.int32(4)

    def clip_edge(carry, edge):
        poly, count = carry
        a, b = edge[0], edge[1]
        slot = jnp.arange(cap)
        active = slot < count
        nxt_i = jnp.where(slot + 1 < count, slot + 1, 0)
        cur = poly
        nxt = poly[nxt_i]
        edge_v = b - a
        cur_side = edge_v[0] * (cur[:, 1] - a[1]) - edge_v[1] * (cur[:, 0] - a[0])
        nxt_side = edge_v[0] * (nxt[:, 1] - a[1]) - edge_v[1] * (nxt[:, 0] - a[0])
        cur_in = cur_side >= -_EPS
        nxt_in = nxt_side >= -_EPS
        denom = cur_side - nxt_side
        t = cur_side / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
        inter = cur + t[:, None] * (nxt - cur)
        # per slot: emit [inter if crossing, nxt if nxt inside]
        emit_inter = active & (cur_in ^ nxt_in)
        emit_next = active & nxt_in
        flags = jnp.stack([emit_inter, emit_next], axis=1).reshape(-1)  # (2*cap,)
        pts = jnp.stack([inter, nxt], axis=1).reshape(-1, 2)  # (2*cap, 2)
        pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
        new_count = jnp.where(flags.any(), pos[-1] + 1, 0).astype(jnp.int32)
        tgt = jnp.where(flags, pos, cap)  # drop slot
        new_poly = jnp.zeros((cap + 1, 2), poly.dtype).at[tgt].set(
            jnp.where(flags[:, None], pts, 0.0), mode="drop"
        )[:cap]
        return (new_poly, jnp.minimum(new_count, cap)), None

    edges = jnp.stack([corners_b, jnp.roll(corners_b, -1, axis=0)], axis=1)  # (4, 2, 2)
    (poly, count), _ = jax.lax.scan(clip_edge, (poly, count), edges)
    slot = jnp.arange(cap)
    valid = slot < count
    nxt = poly[jnp.where(slot + 1 < count, slot + 1, 0)]
    contrib = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(valid, contrib, 0.0)))
    return jnp.where(count >= 3, area, 0.0)


def boxes_overlap_bev(boxes_a, boxes_b, method: str = "candidates"):
    """(N, 7), (M, 7) -> (N, M) rotated BEV overlap areas.

    Parity with the reference ``boxes_overlap_bev_gpu``
    (cpd/ops/iou3d_nms/src/iou3d_nms_api.cpp:11). method 'candidates'
    (default; measured faster on TPU -- the S-H pass pays per-pair scatter
    compaction) or 'clip' (sort-free Sutherland-Hodgman, kept as an
    independent implementation for cross-checks).
    """
    ca = boxes_to_corners_bev(boxes_a)  # (N, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (M, 4, 2)
    single = _overlap_bev_clip if method == "clip" else _overlap_bev_single
    fn = jax.vmap(jax.vmap(single, in_axes=(None, 0)), in_axes=(0, None))
    return fn(ca, cb)


def boxes_iou_bev(boxes_a, boxes_b):
    """(N, 7), (M, 7) -> (N, M) rotated BEV IoU (reference ``boxes_iou_bev_gpu``)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, min=1e-6)


def boxes_iou3d(boxes_a, boxes_b):
    """(N, 7), (M, 7) -> (N, M) 3D IoU with z-extent overlap.

    Parity with ``boxes_iou3d_gpu`` (cpd/ops/iou3d_nms/iou3d_nms_utils.py:67)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_zmin = (boxes_a[:, 2] - boxes_a[:, 5] / 2.0)[:, None]
    a_zmax = (boxes_a[:, 2] + boxes_a[:, 5] / 2.0)[:, None]
    b_zmin = (boxes_b[:, 2] - boxes_b[:, 5] / 2.0)[None, :]
    b_zmax = (boxes_b[:, 2] + boxes_b[:, 5] / 2.0)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_zmax, b_zmax) - jnp.maximum(a_zmin, b_zmin), min=0.0)
    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, min=1e-6)


def boxes_aligned_iou_bev(boxes_a, boxes_b):
    """Axis-aligned nearest-BEV IoU, parity with box_utils.boxes3d_nearest_bev_iou
    (cpd/utils/box_utils.py:275): boxes are converted to their axis-aligned
    BEV footprint by snapping heading to the nearest multiple of pi/2."""

    def to_aabb(b):
        # heading snapped: if closer to +/- pi/2, swap dx/dy
        rot = jnp.abs(jnp.mod(b[:, 6], jnp.pi))
        swap = (rot > jnp.pi / 4) & (rot < 3 * jnp.pi / 4)
        dx = jnp.where(swap, b[:, 4], b[:, 3])
        dy = jnp.where(swap, b[:, 3], b[:, 4])
        return jnp.stack(
            [b[:, 0] - dx / 2, b[:, 1] - dy / 2, b[:, 0] + dx / 2, b[:, 1] + dy / 2],
            axis=-1,
        )

    a = to_aabb(boxes_a)
    b = to_aabb(boxes_b)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.clip(area_a + area_b - inter, min=1e-6)
