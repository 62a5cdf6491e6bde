"""RoI grid pooling primitives: voxel query + grouping + ball query.

TPU-native replacement for the reference's ~1.9k-LoC CUDA ``pointnet2_stack``
component (cpd/ops/pointnet2/pointnet2_stack: voxel_query.cu, group_points.cu,
ball_query.cu) and its wrappers ``VoxelQueryAndGrouping`` /
``NeighborVoxelSAModuleMSG`` (voxel_query_utils.py:51, voxel_pool_modules.py:8)
used by the VoxelRCNN RoI head (voxel_rcnn_head.py:186).

Design: the CUDA voxel query walks a (2R+1)^3 voxel window per query point,
stopping at ``nsample`` non-empty neighbors. Here the window is a STATIC
offset list (optionally dilated to cover large ranges with few taps); every
query does W binary searches into the sorted key table in one vectorized
lookup, then keeps the ``nsample`` nearest found voxels via top-k. Entirely
static shapes; gathers/top-k vectorize on the VPU.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from . import sparse
from .sparse import (GridSpec, INVALID_KEY, SENTINEL,
                     build_bitmap_lut, build_dense_lut, lookup, lookup_dense, lookup_dense_rows,
                     lookup_packed_taps as sparse_lookup_packed_taps,
                     lookup_sorted_rows)
from .geometry import rotate_points_along_z

# LUT path for the RoI voxel queries: run-packed LUT gathers instead of the
# (W, V+Q) rank-join sorts. ``use_lut``/``lut_max_cells`` are plain function
# parameters (threaded from model configs via
# ROI_HEAD.ROI_GRID_POOL.{USE_LUT, LUT_MAX_CELLS}); the defaults below are
# immutable -- there is no module-level tuning state.
QUERY_USE_LUT_DEFAULT = True
QUERY_LUT_MAX_CELLS_DEFAULT = 16_000_000

# per-sample unroll threshold for gather-heavy vmapped ops (rows per sample):
# XLA's leading-batch gather lowering runs ~2x slower than the same gathers
# issued per sample (sparse.PER_SAMPLE_GATHER_MIN_IDX and the measured
# rulebook-build numbers in scripts/exp_r4_books.py). IMMUTABLE constant.
UNROLL_VMAP_MIN_ROWS = 8_192


def unrolled_vmap(fn, args, min_rows: int = None):
    """``jax.vmap(fn)(*args)``, python-UNROLLED per sample when the
    per-sample row count (args[0].shape[1]) is large enough that the batched
    gather lowering penalty outweighs the extra dispatches. Tiny shapes
    (unit tests, the multichip dryrun) keep the single vmapped program so
    compiled op count -- and compile time -- is unchanged."""
    if min_rows is None:
        min_rows = UNROLL_VMAP_MIN_ROWS
    b = args[0].shape[0]
    rows = args[0].shape[1] if args[0].ndim > 1 else 0
    # b == 1 also unrolls: dropping the vmap wrapper removes the leading
    # batch dim of ONE, which alone slows gathers (exp_r4_squeeze.py). The
    # b == 1 squeeze is always safe under a mesh (a size-1 axis cannot be
    # sharded >1-way); b > 1 unrolls slice the sharded batch axis and are
    # disabled under sparse.batch_unroll_disabled() (sharded trainer).
    if rows >= min_rows and (b == 1 or sparse.batch_unroll_allowed()):
        if b > 1:
            sparse._note_unroll()
        slices = [fn(*(a[i] for a in args)) for i in range(b)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *slices)
    return jax.vmap(fn)(*args)


def roi_grid_points(rois, grid_size: int):
    """Dense grid of points inside each roi (voxel_rcnn_head.py get_global_grid_points).

    rois: (N, 7+) -> (N, grid_size^3, 3) world xyz.
    """
    g = grid_size
    idx = jnp.arange(g, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(idx, idx, idx, indexing="ij")
    unit = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)  # (g^3, 3) in [0, g)
    local = (unit + 0.5) / g - 0.5  # centered fractions in [-0.5, 0.5)
    pts = local[None, :, :] * rois[:, None, 3:6]  # scale by dims
    pts = rotate_points_along_z(pts, rois[:, 6])
    return pts + rois[:, None, 0:3]


def _window_offsets(query_range: Tuple[int, int, int], max_taps: int = 135):
    """Static (dz, dy, dx) window offsets ordered by distance from the center,
    truncated to the ``max_taps`` CLOSEST offsets when the full window is
    larger. Distance-sorted truncation keeps the near ball intact (a dilated
    window would skip odd offsets and miss every small-radius neighbor)."""
    rz, ry, rx = query_range
    offs = [
        (dz, dy, dx)
        for dz in range(-rz, rz + 1)
        for dy in range(-ry, ry + 1)
        for dx in range(-rx, rx + 1)
    ]
    offs.sort(key=lambda o: (o[0] ** 2 + o[1] ** 2 + o[2] ** 2, o))
    return jnp.asarray(offs[:max_taps], dtype=jnp.int32)  # (W, 3)


def _taps_for_radius_list(query_range: Tuple[int, int, int], voxel_size_eff,
                          radius: float, max_taps: int = 135):
    """EXACT static tap set as a Python list of (dz, dy, dx): every offset
    whose minimum possible center distance to a query anywhere inside its own
    cell is <= radius.

    Per dim the minimum |(o_d + 0.5 - frac)| * vs_d over frac in [0, 1) is
    max(|o_d| - 0.5, 0) * vs_d; offsets failing the combined bound can never
    contain a neighbor within the ball and are dropped statically. Offsets
    are ordered by nominal center distance (ties broken lexicographically).
    """
    rz, ry, rx = query_range
    vsx, vsy, vsz = (float(v) for v in voxel_size_eff)
    offs = []
    for dz in range(-rz, rz + 1):
        for dy in range(-ry, ry + 1):
            for dx in range(-rx, rx + 1):
                md2 = ((max(abs(dx) - 0.5, 0.0) * vsx) ** 2
                       + (max(abs(dy) - 0.5, 0.0) * vsy) ** 2
                       + (max(abs(dz) - 0.5, 0.0) * vsz) ** 2)
                if md2 <= radius * radius + 1e-9:
                    offs.append((dz, dy, dx))
    offs.sort(key=lambda o: ((o[0] * vsz) ** 2 + (o[1] * vsy) ** 2 + (o[2] * vsx) ** 2, o))
    return offs[:max_taps]


def _taps_for_radius(query_range: Tuple[int, int, int], voxel_size_eff,
                     radius: float, max_taps: int = 135):
    """jnp (W, 3) form of :func:`_taps_for_radius_list`."""
    return jnp.asarray(
        _taps_for_radius_list(query_range, voxel_size_eff, radius, max_taps),
        dtype=jnp.int32,
    )


@partial(jax.jit, static_argnames=("grid", "query_range", "nsample", "downsample"))
def voxel_query(
    query_xyz,  # (Q, 3) world coords
    voxel_keys,  # (V,) sorted int32
    grid: GridSpec,
    voxel_size,  # base (vx, vy, vz)
    point_cloud_range,
    downsample: int,
    query_range: Tuple[int, int, int],
    radius: float,
    nsample: int,
):
    """For each query point: up to ``nsample`` nearest non-empty voxels within
    ``radius`` meters inside the (2R+1)^3 voxel window.

    Returns (idx (Q, nsample) int32, valid (Q, nsample), center_xyz (Q, nsample, 3)).
    """
    vs = jnp.asarray(voxel_size, jnp.float32) * downsample
    pcr = jnp.asarray(point_cloud_range[:3], jnp.float32)
    qc = jnp.floor((query_xyz - pcr) / vs).astype(jnp.int32)  # (Q, 3) xyz order
    offs = _window_offsets(query_range)  # (W, 3) zyx
    w = offs.shape[0]
    # neighbor coords (Q, W, 3) in zyx
    qzyx = qc[:, ::-1]
    nc = qzyx[:, None, :] + offs[None, :, :]
    in_bounds = (
        (nc[..., 2] >= 0) & (nc[..., 2] < grid.nx)
        & (nc[..., 1] >= 0) & (nc[..., 1] < grid.ny)
        & (nc[..., 0] >= 0) & (nc[..., 0] < grid.nz)
    )
    nkeys = (nc[..., 0] * grid.ny + nc[..., 1]) * grid.nx + nc[..., 2]
    nkeys = jnp.where(in_bounds, nkeys, INVALID_KEY).astype(jnp.int32)
    idx, found = lookup(voxel_keys, nkeys.reshape(-1))
    idx = idx.reshape(-1, w)
    found = found.reshape(-1, w)
    # voxel centers
    centers = (nc.astype(jnp.float32)[..., ::-1] + 0.5) * vs + pcr  # (Q, W, 3) xyz
    dist = jnp.linalg.norm(centers - query_xyz[:, None, :], axis=-1)
    ok = found & (dist <= radius)
    score = jnp.where(ok, -dist, -jnp.inf)
    top_score, sel = jax.lax.top_k(score, nsample)  # (Q, nsample)
    sel_idx = jnp.take_along_axis(idx, sel, axis=1)
    sel_valid = jnp.isfinite(top_score)
    sel_centers = jnp.take_along_axis(centers, sel[..., None], axis=1)
    return sel_idx, sel_valid, sel_centers


def voxel_query_fast(
    query_xyz,  # (Q, 3) world coords (any order)
    voxel_keys,  # (V,) sorted int32
    grid: GridSpec,
    voxel_size: Tuple[float, float, float],
    point_cloud_range,
    downsample: int,
    query_range: Tuple[int, int, int],
    radius: float,
    nsample: int,
    max_taps: int = 135,
    lut=None,
    select: str = "nearest",
    use_lut: bool = QUERY_USE_LUT_DEFAULT,
    lut_max_cells: int = QUERY_LUT_MAX_CELLS_DEFAULT,
):
    """Single-radius voxel query (the reference's voxel_query.cu): delegates
    to :func:`voxel_query_multi` with one radius group. The tap set is the
    EXACT static pruning of the window to offsets that can possibly contain a
    ball neighbor (_taps_for_radius). ``select="nearest"`` (default here, for
    oracle tests) keeps the nsample nearest; ``"first"`` is the reference's
    first-found-in-scan-order semantics. Same return contract as
    ``voxel_query``."""
    (out,) = voxel_query_multi(
        query_xyz, voxel_keys, grid, voxel_size, point_cloud_range,
        downsample, query_range, (radius,), nsample, max_taps=max_taps,
        lut=lut, select=select, use_lut=use_lut, lut_max_cells=lut_max_cells,
    )
    return out


@partial(jax.jit, static_argnames=("grid", "voxel_size", "query_range", "nsample",
                                   "downsample", "radii", "max_taps", "select",
                                   "use_lut", "lut_max_cells"))
def voxel_query_multi(
    query_xyz,
    voxel_keys,
    grid: GridSpec,
    voxel_size: Tuple[float, float, float],
    point_cloud_range,
    downsample: int,
    query_range: Tuple[int, int, int],
    radii: Tuple[float, ...],
    nsample: int,
    max_taps: int = 135,
    lut=None,
    select: str = "first",
    use_lut: bool = QUERY_USE_LUT_DEFAULT,
    lut_max_cells: int = QUERY_LUT_MAX_CELLS_DEFAULT,
):
    """Multi-radius voxel query sharing ONE set of LUT lookups.

    The smaller radii's tap sets are subsets of the largest radius's
    (_taps_for_radius is monotone in radius) and the union tap list is built
    in NESTED-PREFIX order, so each radius works on a free SLICE of the
    shared lookup rows (19 of ~35 union taps for the r=0.4 group at x_conv3).

    ``select`` picks the neighbor-selection semantics:
      * ``"first"`` (default, the reference semantics): the first ``nsample``
        neighbors found in tap order -- the CUDA voxel_query walks the window
        and stops at nsample (voxel_query_gpu.cu:38-80, `if (cnt < nsample)`
        with no distance sorting); our tap order is center-distance sorted, a
        strictly more sensible scan order. Implemented sort-free as
        cumsum-rank + one-hot contraction (measured 3.8x faster than top_k).
      * ``"nearest"``: exact nsample nearest by center distance (top_k).

    Returns a tuple of (idx, valid, centers) per radius.
    """
    q_n = query_xyz.shape[0]
    vs = jnp.asarray(voxel_size, jnp.float32) * downsample
    pcr = jnp.asarray(point_cloud_range[:3], jnp.float32)
    qc_xyz = jnp.floor((query_xyz - pcr) / vs).astype(jnp.int32)
    in_grid = (
        (qc_xyz[:, 0] >= 0) & (qc_xyz[:, 0] < grid.nx)
        & (qc_xyz[:, 1] >= 0) & (qc_xyz[:, 1] < grid.ny)
        & (qc_xyz[:, 2] >= 0) & (qc_xyz[:, 2] < grid.nz)
    )
    qkeys = (qc_xyz[:, 2] * grid.ny + qc_xyz[:, 1]) * grid.nx + qc_xyz[:, 0]
    qkeys = jnp.where(in_grid, qkeys, SENTINEL)
    use_lut = (use_lut and grid.num_cells <= lut_max_cells) or lut is not None
    if use_lut:
        order = None  # LUT path: no query sorting, no unsort scatter
        sq = qkeys
    else:
        order = jnp.argsort(qkeys)
        sq = qkeys[order]
    vs_eff = tuple(float(x) * downsample for x in voxel_size)
    # union tap list in NESTED-PREFIX order: taps of the smallest radius
    # first, then each larger radius's new taps. Every radius's tap subset is
    # then a contiguous PREFIX, so the per-radius selection below is a free
    # slice (a static row gather measured ~25 ms slower at x_conv3 scale).
    union_list = []
    union_pos = {}
    prefix_len = {}
    for rr in sorted(set(radii)):
        for o in _taps_for_radius_list(query_range, vs_eff, rr, max_taps):
            if o not in union_pos and len(union_list) < max_taps:
                union_pos[o] = len(union_list)
                union_list.append(o)
        prefix_len[rr] = len(union_list)
    radius_w = [prefix_len[rr] for rr in radii]
    offs = jnp.asarray(union_list, dtype=jnp.int32)
    w = offs.shape[0]
    sqc = qc_xyz if order is None else qc_xyz[order]
    nx_c = sqc[None, :, 0] + offs[:, None, 2]
    ny_c = sqc[None, :, 1] + offs[:, None, 1]
    nz_c = sqc[None, :, 2] + offs[:, None, 0]
    in_bounds = (
        (nx_c >= 0) & (nx_c < grid.nx) & (ny_c >= 0) & (ny_c < grid.ny)
        & (nz_c >= 0) & (nz_c < grid.nz)
    )
    if use_lut:
        if lut is None:
            lut = build_bitmap_lut(voxel_keys, grid)
        idx_all, found_all = sparse_lookup_packed_taps(
            lut, jnp.where(sq >= SENTINEL, 0, sq), union_list, grid,
            in_bounds & (sq[None, :] < SENTINEL),
        )
    else:
        deltas = (offs[:, 0] * grid.ny + offs[:, 1]) * grid.nx + offs[:, 2]
        rows = jnp.where(sq[None, :] >= SENTINEL, SENTINEL, sq[None, :] + deltas[:, None])
        safe_keys = jnp.where(voxel_keys != INVALID_KEY, voxel_keys, SENTINEL)
        idx_all, found_all = lookup_sorted_rows(safe_keys, rows)
        found_all = found_all & in_bounds
    # squared center distance per tap (the mask + ordering needs no sqrt; the
    # (W, Q, 3) centers tensor is never materialized -- selected centers are
    # reconstructed from tap ids afterwards)
    sorted_query_xyz = query_xyz if order is None else query_xyz[order]
    dxc = (nx_c.astype(jnp.float32) + 0.5) * vs[0] + pcr[0] - sorted_query_xyz[None, :, 0]
    dyc = (ny_c.astype(jnp.float32) + 0.5) * vs[1] + pcr[1] - sorted_query_xyz[None, :, 1]
    dzc = (nz_c.astype(jnp.float32) + 0.5) * vs[2] + pcr[2] - sorted_query_xyz[None, :, 2]
    dist2 = dxc * dxc + dyc * dyc + dzc * dzc
    if order is None:
        inv = None
    else:
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(q_n, dtype=order.dtype))

    def centers_from_taps(taps):
        """(Q, K) tap ids -> (Q, K, 3) world centers of the tapped cells."""
        off_sel = offs[taps]  # (Q, K, 3) zyx; tiny static table gather
        c_xyz = sqc[:, None, :] + off_sel[..., ::-1]
        return (c_xyz.astype(jnp.float32) + 0.5) * vs + pcr

    outs = []
    for radius, wi in zip(radii, radius_w):
        idx_i, found_i, dist2_i = idx_all[:wi], found_all[:wi], dist2[:wi]
        ok = found_i & (dist2_i <= radius * radius)
        if select == "nearest":
            score = jnp.where(ok, -dist2_i, -jnp.inf)
            k_eff = min(nsample, wi)
            top_score, sel = jax.lax.top_k(score.T, k_eff)
            sel_idx = jnp.take_along_axis(idx_i.T, sel, axis=1)
            sel_valid = jnp.isfinite(top_score)
            sel_centers = centers_from_taps(sel)
            if k_eff < nsample:
                pad = nsample - k_eff
                sel_idx = jnp.pad(sel_idx, ((0, 0), (0, pad)))
                sel_valid = jnp.pad(sel_valid, ((0, 0), (0, pad)))
                sel_centers = jnp.pad(sel_centers, ((0, 0), (0, pad), (0, 0)))
        else:
            # first-nsample-found in (distance-sorted) tap order, sort-free:
            # running rank -> slot one-hot -> contractions select per slot.
            # NOTE: keep these as separate 'wq,wqk->qk' einsums -- stacking
            # them into one 'swq,wqk->sqk' contraction lowers ~5x slower
            # (101 vs 21 ms for the RoI queries, measured on chip)
            rank = jnp.cumsum(ok.astype(jnp.int32), axis=0)
            slot = rank - 1
            keep = ok & (slot < nsample)
            oh = (keep[:, :, None]
                  & (slot[:, :, None]
                     == jax.lax.broadcasted_iota(jnp.int32, (wi, q_n, nsample), 2)))
            ohf = oh.astype(jnp.float32)
            sel_idx = jnp.einsum(
                "wq,wqk->qk", idx_i.astype(jnp.float32), ohf).astype(jnp.int32)
            sel_valid = jnp.sum(ohf, axis=0) > 0
            tap_ids = jnp.einsum(
                "wq,wqk->qk",
                jnp.broadcast_to(
                    jax.lax.broadcasted_iota(jnp.float32, (wi, 1), 0), (wi, q_n)),
                ohf,
            ).astype(jnp.int32)
            sel_centers = centers_from_taps(tap_ids)
        if inv is None:
            outs.append((sel_idx, sel_valid, sel_centers))
        else:
            outs.append((sel_idx[inv], sel_valid[inv], sel_centers[inv]))
    return tuple(outs)


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(query_xyz, points_xyz, points_valid, radius: float, nsample: int):
    """Dense ball query (pointnet2_batch semantics): for each query, up to
    ``nsample`` points within ``radius``. O(Q*N) masked distance matrix --
    use for moderate N; the sparse ``voxel_query`` is the production path.

    Returns (idx (Q, nsample), valid (Q, nsample)).
    """
    d = jnp.linalg.norm(query_xyz[:, None, :] - points_xyz[None, :, :3], axis=-1)
    ok = (d <= radius) & points_valid[None, :]
    score = jnp.where(ok, -d, -jnp.inf)
    top_score, sel = jax.lax.top_k(score, nsample)
    return sel.astype(jnp.int32), jnp.isfinite(top_score)


def group_and_pool(features, idx, valid, rel_pos, mlp_fn):
    """Grouping + shared MLP + masked max-pool (VoxelQueryAndGrouping + SA module).

    features: (V, C); idx/valid: (Q, K); rel_pos: (Q, K, 3) query-to-neighbor
    offsets; mlp_fn: callable (Q, K, C+3) -> (Q, K, D). Returns (Q, D).
    """
    # per-neighbor-slot gathers: a (Q*K,)-row gather lowers to a ~12x slower
    # scalar path on TPU than K separate (Q,)-row gathers (see
    # sparse.gather_rows_per_tap)
    g = jnp.stack([features[idx[:, t]] for t in range(idx.shape[1])], axis=1)
    # keep the grouped tensor in the FEATURE dtype (bf16 halves the gather
    # bytes); rel_pos offsets are small-magnitude so the cast is lossless
    # at the precision that matters
    g = jnp.concatenate([rel_pos.astype(features.dtype), g], axis=-1)
    g = jnp.where(valid[..., None], g, 0.0)
    h = mlp_fn(g)
    h = jnp.where(valid[..., None], h, -1e9)  # finite fill: -inf NaNs the max grad
    pooled = jnp.max(h, axis=1)
    any_valid = jnp.any(valid, axis=1)
    return jnp.where(any_valid[:, None], pooled, 0.0)


def farthest_point_sample(points, valid, num_samples: int):
    """FPS (pointnet2 sampling.cu equivalent): iterative max-min selection via
    lax.fori_loop; O(num_samples * N) vector ops. points: (N, 3)."""
    n = points.shape[0]
    big = jnp.where(valid, jnp.inf, -jnp.inf)

    def body(i, state):
        dists, sel = state
        far = jnp.argmax(jnp.where(valid, dists, -jnp.inf))
        sel = sel.at[i].set(far.astype(jnp.int32))
        d_new = jnp.linalg.norm(points - points[far], axis=-1)
        dists = jnp.minimum(dists, d_new)
        return dists, sel

    dists0 = jnp.where(valid, jnp.inf, -jnp.inf)
    # seed: first valid point
    first = jnp.argmax(valid)
    dists0 = jnp.minimum(dists0, jnp.linalg.norm(points - points[first], axis=-1))
    sel0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first.astype(jnp.int32))
    dists, sel = jax.lax.fori_loop(1, num_samples, body, (dists0, sel0))
    return sel


def three_nn_interpolate(query_xyz, support_xyz, support_valid, support_feats):
    """Inverse-distance 3-NN interpolation (pointnet2 interpolate.cu equivalent).

    query: (Q, 3); support: (N, 3) + (N,) valid + (N, C) -> (Q, C).
    """
    d = jnp.linalg.norm(query_xyz[:, None, :] - support_xyz[None, :, :], axis=-1)
    d = jnp.where(support_valid[None, :], d, jnp.inf)
    nd, ni = jax.lax.top_k(-d, 3)
    w = 1.0 / jnp.clip(-nd, min=1e-8)
    w = jnp.where(jnp.isfinite(nd), w, 0.0)
    w = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1e-8)
    return jnp.einsum("qk,qkc->qc", w, support_feats[ni])
