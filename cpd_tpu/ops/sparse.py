"""Sparse 3D convolution substrate: static-shape rulebooks + gather-GEMM.

TPU-native replacement for the external spconv 2.x dependency of the
reference (SubMConv3d / SparseConv3d used by
cpd/models/backbones_3d/spconv_backbone.py via cpd/utils/spconv_utils.py).

Design (TPU-first, nothing like spconv's hash-table CUDA implementation):

* A sparse tensor is (features (V_cap, C), keys (V_cap,)) where ``keys`` are
  int32 linearized zyx coordinates, SORTED ascending, with padding slots set
  to INT32_MAX at the end. Sortedness is the core invariant -- no hash
  tables, no dynamic shapes.

* Neighbor resolution: a dense per-stage key->row LUT with PER-TAP-ROW
  gathers (``lookup_dense_rows``; a flattened multi-tap gather lowers to a
  ~12x slower scalar path on TPU), falling back to the batched rank-join
  (``lookup_sorted_rows``) above ``DENSE_LUT_MAX_CELLS``.

* Rulebooks are dense (V_cap, K) int32 gather index tables + found masks,
  built once per sparsity pattern and shared by all convolutions with the
  same ``indice_key`` (mirroring spconv's indice_key reuse semantics,
  spconv_backbone.py:160-193 in the reference).

* Convolution = tap-major masked im2col (K per-tap row gathers ->
  (B, K, V, C)) contracted against (K, Cin, Cout) weights in ONE MXU GEMM,
  with a custom VJP whose backward is ONE transpose-rulebook gather + two
  GEMMs (dX via mirrored/inverse rulebooks; dW re-indexed through the same
  gathered cotangent) -- zero scatter-adds anywhere in the conv path.

* Downsampling (strided) convs build their output coordinate set with a
  sort-unique over the reduced candidate enumeration (ceil(k/s) candidates
  per dim per input voxel), again static-shape with capacity + masks.
"""
from __future__ import annotations

from contextlib import contextmanager
from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

INVALID_KEY = jnp.iinfo(jnp.int32).max  # padding sentinel for key arrays


class GridSpec(NamedTuple):
    """Static spatial grid (nx, ny, nz). Keys are ((z * ny) + y) * nx + x."""

    nx: int
    ny: int
    nz: int

    @property
    def num_cells(self) -> int:
        return self.nx * self.ny * self.nz

    def downsample(self, stride: Tuple[int, int, int], padding: Tuple[int, int, int],
                   kernel: Tuple[int, int, int]) -> "GridSpec":
        # conv output size: floor((n + 2p - k) / s) + 1, per dim (x, y, z order)
        k = kernel
        s = stride
        p = padding
        nx = (self.nx + 2 * p[0] - k[0]) // s[0] + 1
        ny = (self.ny + 2 * p[1] - k[1]) // s[1] + 1
        nz = (self.nz + 2 * p[2] - k[2]) // s[2] + 1
        return GridSpec(nx, ny, nz)


def keys_from_coords(coords_zyx, grid: GridSpec, valid=None):
    """(V, 3) int zyx -> (V,) int32 keys; out-of-bounds/invalid -> INVALID_KEY."""
    z, y, x = coords_zyx[:, 0], coords_zyx[:, 1], coords_zyx[:, 2]
    in_bounds = (
        (x >= 0) & (x < grid.nx) & (y >= 0) & (y < grid.ny) & (z >= 0) & (z < grid.nz)
    )
    if valid is not None:
        in_bounds = in_bounds & valid
    key = (z * grid.ny + y) * grid.nx + x
    return jnp.where(in_bounds, key, INVALID_KEY).astype(jnp.int32)


def coords_from_keys(keys, grid: GridSpec):
    """(V,) int32 keys -> (V, 3) int32 zyx (junk rows for INVALID_KEY slots)."""
    x = keys % grid.nx
    y = (keys // grid.nx) % grid.ny
    z = keys // (grid.nx * grid.ny)
    return jnp.stack([z, y, x], axis=-1)


def lookup(sorted_keys, queries):
    """Binary-search ``queries`` in ``sorted_keys``.

    Returns (idx (Q,), found (Q,) bool). idx is clamped in-range so gathers
    are always safe; ``found`` is False for padding/missing queries.
    """
    v = sorted_keys.shape[0]
    idx = jnp.searchsorted(sorted_keys, queries).astype(jnp.int32)
    idx = jnp.clip(idx, 0, v - 1)
    found = (sorted_keys[idx] == queries) & (queries != INVALID_KEY)
    return idx, found


SENTINEL = jnp.int32(1 << 30)  # > any real key (grids < 2^27 cells); < INT32_MAX/2


def lookup_sorted_rows(sorted_keys, queries):
    """Rank-trick join: find each query in ``sorted_keys`` when every ROW of
    ``queries`` (R, Q) is sorted ascending (monotone query construction).

    TPU-native replacement for binary search (jnp.searchsorted lowers to
    per-element while-loops, ~5x slower on TPU than one batched sort).
    Method: merge each query row with the key array by sorting the tagged
    concatenation (keys even, queries odd -- ties put the key first), invert
    the permutation to get ranks; ``rank - position`` is the
    searchsorted-right insertion point. Cost: one (R, V+Q) int32 sort + one
    permutation scatter.

    Contract: all values < SENTINEL are real; padding slots hold values
    >= SENTINEL (still sorted). Returns (idx (R, Q) int32 clamped,
    found (R, Q) bool).
    """
    v = sorted_keys.shape[0]
    r, q = queries.shape
    a_pad = sorted_keys >= SENTINEL
    a2 = jnp.where(a_pad, jnp.iinfo(jnp.int32).max, sorted_keys * 2)
    q_pad = queries >= SENTINEL
    q2 = jnp.where(q_pad, jnp.iinfo(jnp.int32).max, queries * 2 + 1)
    merged = jnp.concatenate([jnp.broadcast_to(a2[None], (r, v)), q2], axis=1)
    order = jnp.argsort(merged, axis=1)
    ranks = jnp.zeros_like(order).at[
        jnp.arange(r)[:, None], order
    ].set(jnp.broadcast_to(jnp.arange(v + q, dtype=order.dtype)[None], (r, v + q)))
    pos = ranks[:, v:] - jnp.arange(q, dtype=order.dtype)[None]  # searchsorted-right
    idx = jnp.clip(pos - 1, 0, v - 1).astype(jnp.int32)
    found = (sorted_keys[idx] == queries) & ~q_pad
    return idx, found


# grids up to this many cells use a dense key->row lookup table (scatter once,
# then every neighbor lookup is one int32 gather); larger grids use the
# rank-join. 100M cells covers every CPD grid including stage 0 (92.7M cells
# = 371MB int32 per sample -- measured faster than the join even so; lower
# this if batch-4 training at full caps pressures HBM). The SIGABRT
# previously blamed on LUT size was the voxel_query LUT variant (disabled).
# IMMUTABLE default of the ``lut_max_cells`` parameters (config key
# BACKBONE_3D.LUT_MAX_CELLS) -- never assign to it; pass the parameter.
DENSE_LUT_MAX_CELLS = 100_000_000


def _padded_cells(grid: GridSpec) -> int:
    """LUT length: num_cells rounded up to a multiple of 4 (packed-row reads)."""
    return -(-grid.num_cells // 4) * 4


def build_dense_lut(keys, grid: GridSpec):
    """(V,) sorted keys -> (padded_cells/4, 4) int32 LUT: LUT[key >> 2,
    key & 3] = row, -1 empty.

    The table is built NATIVELY 2-D: reshaping a flat table inside jit is a
    ~36 ms relayout copy at stage-0 scale, while every lookup form is faster
    off the 2-D layout (row gather of a 16B lane group beats a 4B element
    gather on the latency-bound path: 16.2 vs 25.7 ms for 13 taps, 12.1 ms
    run-packed). Invalid rows are routed past the padded end so the
    drop-mode scatter discards them (writing them to cell 0 would clobber a
    real voxel at linearized key 0 -- the grid corner).
    """
    cells = _padded_cells(grid)
    valid = keys != INVALID_KEY
    target = jnp.where(valid, keys, cells)
    lut = jnp.full((cells // 4, 4), -1, jnp.int32)
    rows = jnp.arange(keys.shape[0], dtype=jnp.int32)
    return lut.at[target >> 2, target & 3].set(rows, mode="drop")


def _lane_select(rows, lane):
    """rows (V, L) int32, lane (V,) int -> (V,) picked lanes (one-hot sum)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.sum(jnp.where(lanes == lane[:, None], rows, 0), axis=1)


def build_bitmap_lut(keys, grid: GridSpec):
    """(V,) sorted UNIQUE keys -> (ceil(cells/32), 3) int32 bitmap-rank table:
    column 0 = 32-cell occupancy word, column 1 = exclusive prefix count of
    occupied cells before the word, column 2 = the NEXT word (word of the
    following 32 cells; 0 past the grid).

    row(key) = prefix[key >> 5] + popcount(word & ((1 << (key & 31)) - 1));
    found    = (word >> (key & 31)) & 1.

    ~11x smaller than the dense int32 LUT (at stage-0 scale 35 MB vs 371 MB)
    and ~10x cheaper to build: no 371 MB fill -- one scatter-ADD of single
    bits (keys are unique, so bits never collide within a word) plus a
    cumsum over words. Rank equals the sorted row index by construction.

    The next-word column makes every dx-RUN lookup of span <= 32 a SINGLE
    row fetch (the lookups are HBM-transaction-bound): a run straddling the
    word boundary reads its second word from column 2, whose prefix is
    derived for free as prefix + popcount(word)."""
    cells = grid.num_cells
    n_words = -(-cells // 32) + 1  # +1 drop slot for invalid keys
    valid = keys != INVALID_KEY
    w = jnp.where(valid, keys >> 5, n_words - 1)
    bit = jnp.where(valid, keys & 31, 0)
    words = jnp.zeros((n_words,), jnp.int32).at[w].add(
        jnp.where(valid, jnp.int32(1) << bit, 0), mode="drop")
    counts = jax.lax.population_count(words)
    prefix = jnp.cumsum(counts) - counts  # exclusive
    words = words[: n_words - 1]
    nxt = jnp.concatenate([words[1:], jnp.zeros((1,), jnp.int32)])
    return jnp.stack([words, prefix[: n_words - 1], nxt], axis=1)


def _bitmap_rank(word, prefix, bit):
    """row + found of a (word, prefix) pair at bit position ``bit`` (0..31)."""
    mask = (jnp.int32(1) << bit) - jnp.int32(1)
    row = prefix + jax.lax.population_count(word & mask)
    found = ((word >> bit) & 1).astype(bool)
    return row, found


def lookup_bitmap(bm, queries, query_ok):
    """Bitmap-rank lookup: queries (V,) int32 cells -> (idx, found)."""
    n_words = bm.shape[0]
    safe_q = jnp.where(query_ok, queries, 0)
    pair = bm[jnp.clip(safe_q >> 5, 0, n_words - 1)]  # (V, 2)
    row, hit = _bitmap_rank(pair[:, 0], pair[:, 1], safe_q & 31)
    found = query_ok & hit
    return jnp.where(found, row, 0).astype(jnp.int32), found


def lookup_bitmap_rows(bm, queries, query_ok):
    """lookup_bitmap for (P, V) tap-major queries: grouped (P, V)-index row
    gathers (same rows as P per-tap gathers, chunked under the gather
    fast-path budget)."""
    n_words = bm.shape[0]
    safe_q = jnp.where(query_ok, queries, 0)
    w = jnp.clip(safe_q >> 5, 0, n_words - 1)
    pper = max(1, FLAT_GATHER_MAX_IDX // w.shape[1])
    pairs = jnp.concatenate(
        [bm[w[p0:p0 + pper]] for p0 in range(0, w.shape[0], pper)],
        axis=0)  # (P, V, 3)
    row, hit = _bitmap_rank(pairs[..., 0], pairs[..., 1], safe_q & 31)
    found = query_ok & hit
    return jnp.where(found, row, 0).astype(jnp.int32), found


def lookup_bitmap_packed_taps(bm, base_cells, offsets_zyx, grid: GridSpec, query_ok):
    """Run-packed bitmap-rank lookups: ONE 12-byte row per dx-RUN of taps
    (cells c..c+span-1 touch at most 2 adjacent 32-bit words for span <= 31;
    the second word rides column 2 of the same row and its prefix is derived
    as prefix + popcount(word)), and ALL runs' row fetches are GROUPED into a
    single (R, V)-index gather: same fetched rows, one dispatch instead of R
    latency-serialized ones. Mirrors :func:`lookup_packed_taps` on the
    bitmap table."""
    p = len(offsets_zyx)
    n_words = bm.shape[0]
    runs = _delta_runs(offsets_zyx, grid)
    w0s = []
    for d0, run in runs:
        span = run[-1][0] - d0 + 1
        assert span <= 32, f"dx-run span {span} exceeds one next-word window"
        w0s.append(jnp.clip((base_cells + d0) >> 5, 0, n_words - 1))
    wstack = jnp.stack(w0s)  # (R, V)
    # grouped row fetch, CHUNKED under the gather fast-path budget (the
    # ~2M-index cliff, FLAT_GATHER_MAX_IDX): R*V stays small for the conv
    # rulebooks but the 135-tap RoI query windows exceed it
    v = wstack.shape[1]
    rper = max(1, FLAT_GATHER_MAX_IDX // v)
    rows_all = jnp.concatenate(
        [bm[wstack[r0:r0 + rper]] for r0 in range(0, wstack.shape[0], rper)],
        axis=0)  # (R, V, 3) word/prefix/next
    rows = [None] * p
    hits = [None] * p
    for ri, (d0, run) in enumerate(runs):
        span = run[-1][0] - d0 + 1
        w0 = wstack[ri]
        row0 = rows_all[ri]  # (V, 3): word, prefix, next word
        straddles = span > 1
        if straddles:
            pref1 = row0[:, 1] + jax.lax.population_count(row0[:, 0])
        for d, t in run:
            cell = base_cells + d
            if straddles:
                in_next = (cell >> 5) > w0
                word = jnp.where(in_next, row0[:, 2], row0[:, 0])
                pref = jnp.where(in_next, pref1, row0[:, 1])
            else:
                word, pref = row0[:, 0], row0[:, 1]
            r, h = _bitmap_rank(word, pref, cell & 31)
            rows[t] = r
            hits[t] = h
    found = query_ok & jnp.stack(hits)
    return jnp.where(found, jnp.stack(rows), 0).astype(jnp.int32), found


def lookup_bitmap_runs_dynamic(bm, cells, ok, run: int = 3):
    """Run-packed bitmap lookups for DYNAMIC per-row cell groups.

    cells (P, V) int32 grouped as ``run`` consecutive taps whose valid cells
    per row span at most ONE cell step (so the group's word index spans at
    most 2 adjacent words -- e.g. the dx-triples of a stride-2 transpose
    rulebook, where o_x = (x + p - dx)/2 takes <= 2 consecutive values).
    Unlike :func:`lookup_bitmap_packed_taps` the group's base cell is not a
    static delta off a shared base, so it is derived per row as the masked
    min. ONE (word, prefix, next-word) row fetch serves the whole group:
    P/run latency-bound fetches instead of P.

    Returns (idx (P, V) int32 clamped >= 0, found (P, V) bool)."""
    p, v = cells.shape
    assert p % run == 0
    n_words = bm.shape[0]
    big = jnp.int32(1 << 30)
    rows, hits = [None] * p, [None] * p
    cg = cells.reshape(p // run, run, v)
    okg = ok.reshape(p // run, run, v)
    cmin = jnp.min(jnp.where(okg, cg, big), axis=1)  # (P/run, V)
    cmin = jnp.where(cmin == big, 0, cmin)
    wstack = jnp.clip(cmin >> 5, 0, n_words - 1)
    rows_all = bm[wstack]  # ONE grouped gather: (P/run, V, 3)
    for gi, g0 in enumerate(range(0, p, run)):
        w0 = wstack[gi]
        row0 = rows_all[gi]  # (V, 3): word, prefix, next word
        pref1 = row0[:, 1] + jax.lax.population_count(row0[:, 0])
        for t in range(g0, g0 + run):
            cell = jnp.where(ok[t], cells[t], cmin[gi])
            in_next = (cell >> 5) > w0
            word = jnp.where(in_next, row0[:, 2], row0[:, 0])
            pref = jnp.where(in_next, pref1, row0[:, 1])
            r, h = _bitmap_rank(word, pref, cell & 31)
            rows[t] = r
            hits[t] = h
    found = ok & jnp.stack(hits)
    return jnp.where(found, jnp.stack(rows), 0).astype(jnp.int32), found


def lookup_dense(lut, queries, query_ok):
    """LUT path: queries (V,) int32 cell keys into the 2-D packed LUT
    (last dim 4) or bitmap-rank table (last dim 3); query_ok masks in-bounds
    rows. Returns (idx clamped >=0, found)."""
    if lut.shape[-1] == 3:
        return lookup_bitmap(lut, queries, query_ok)
    safe_q = jnp.where(query_ok, queries, 0)
    rows = _lane_select(lut[safe_q >> 2], safe_q & 3)
    found = query_ok & (rows >= 0)
    return jnp.where(found, rows, 0).astype(jnp.int32), found


def lookup_dense_rows(lut, queries, query_ok):
    """lookup_dense for (P, V) tap-major queries, one ROW gather per tap.

    One flattened (P*V,)-index gather lowers to the slow scalar path on TPU
    (see gather_rows_per_tap); P separate row gathers from the packed 2-D
    table run at HBM latency (16.2 ms / 13 taps at stage-0 scale)."""
    if lut.shape[-1] == 3:
        return lookup_bitmap_rows(lut, queries, query_ok)
    p = queries.shape[0]
    safe_q = jnp.where(query_ok, queries, 0)
    rows = jnp.stack([
        _lane_select(lut[safe_q[t] >> 2], safe_q[t] & 3) for t in range(p)
    ])
    found = query_ok & (rows >= 0)
    return jnp.where(found, rows, 0).astype(jnp.int32), found


def _delta_runs(offsets_zyx, grid: GridSpec):
    """Group static (dz, dy, dx) taps into runs of CONSECUTIVE linearized
    deltas (dx-adjacent taps in the same (dz, dy) plane). Returns a list of
    runs [(d0, [(delta, tap_pos), ...]), ...] sorted by delta."""
    tagged = sorted(
        (((dz * grid.ny + dy) * grid.nx + dx), t)
        for t, (dz, dy, dx) in enumerate(offsets_zyx)
    )
    runs = []
    cur = [tagged[0]]
    for d, t in tagged[1:]:
        if d == cur[-1][0] + 1:
            cur.append((d, t))
        else:
            runs.append(cur)
            cur = [(d, t)]
    runs.append(cur)
    return [(r[0][0], r) for r in runs]


def lookup_packed_taps(lut, base_cells, offsets_zyx, grid: GridSpec, query_ok):
    """Run-packed LUT lookups: one 4-wide row gather pair per dx-RUN of taps.

    Measured 2x faster than per-tap narrow gathers at stage-0 scale (12.1 vs
    24.7 ms for the 13-tap lookup on the 92.7M-cell table): the lookups are
    HBM-latency-bound, so fetching (cells/4, 4) ROWS covering a whole run of
    dx-adjacent cells roughly halves the number of latency-bound rows; the
    per-tap lane selection is cheap VPU work.

    lut: (padded_cells/4, 4) int32 from :func:`build_dense_lut`, or a
    (words, 3) bitmap-rank table from :func:`build_bitmap_lut` (dispatched
    by last dim); base_cells: (V,) int32 base cell per query row (any value
    when not ok); offsets_zyx: STATIC list of P (dz, dy, dx) taps;
    query_ok: (P, V) bool per-tap validity (in-bounds & valid source row).
    Returns (idx (P, V) int32 clamped >= 0, found (P, V) bool).
    """
    if lut.shape[-1] == 3:
        return lookup_bitmap_packed_taps(lut, base_cells, offsets_zyx, grid, query_ok)
    p = len(offsets_zyx)
    cells4 = lut.shape[0]
    vals = [None] * p
    for d0, run in _delta_runs(offsets_zyx, grid):
        span = run[-1][0] - d0 + 1
        n_rows = 1 + (span + 2) // 4  # covers any alignment of the run
        c0 = base_cells + d0
        p0 = jnp.clip(c0 >> 2, 0, cells4 - n_rows)
        cat = jnp.concatenate([lut[p0 + j] for j in range(n_rows)], axis=1)  # (V, 4R)
        for d, t in run:
            lane = (base_cells + d) - (p0 << 2)
            vals[t] = _lane_select(cat, lane)
    rows = jnp.stack(vals)
    found = query_ok & (rows >= 0)
    return jnp.where(found, rows, 0).astype(jnp.int32), found


def build_padded_bitmap(keys, grid: GridSpec):
    """(V,) sorted keys -> (nz, ny, wr) uint32 occupancy words on a row-
    PADDED layout (wr = ceil(nx/32) words per x-row, rows word-aligned).

    Unlike :func:`build_bitmap_lut` (whose words straddle y/z rows because
    they pack the raw linearized key), every (z, y) row here starts on a word
    boundary, so y/z shifts of the occupancy field are plain array slices and
    x shifts are word-level bit shifts with a single intra-row carry. This is
    the substrate for the sort-free strided-conv active-set derivation
    (:func:`_bitmap_downsample`). Padding bits (x >= nx) are never set."""
    wr = -(-grid.nx // 32)
    n_words = grid.nz * grid.ny * wr + 1  # +1 drop slot
    valid = keys != INVALID_KEY
    x = keys % grid.nx
    zy = keys // grid.nx  # z * ny + y
    w = jnp.where(valid, zy * wr + (x >> 5), n_words - 1)
    bit = jnp.where(valid, x & 31, 0).astype(jnp.uint32)
    words = jnp.zeros((n_words,), jnp.uint32).at[w].add(
        jnp.where(valid, jnp.uint32(1) << bit, jnp.uint32(0)), mode="drop")
    return words[:-1].reshape(grid.nz, grid.ny, wr)


def _shift_bits_x(bm, d: int):
    """Occupancy shifted by ``d`` cells along x: out[x] = in[x + d].
    bm: (..., wr) uint32; carries ride within the row (rows are word-aligned),
    cells shifted past either row end vanish."""
    if d == 0:
        return bm
    if d > 0:  # in[x + d]: bits move DOWN by d
        nxt = jnp.concatenate([bm[..., 1:], jnp.zeros_like(bm[..., :1])], axis=-1)
        return (bm >> d) | (nxt << (32 - d))
    d = -d  # in[x - d]: bits move UP by d
    prv = jnp.concatenate([jnp.zeros_like(bm[..., :1]), bm[..., :-1]], axis=-1)
    return (bm << d) | (prv >> (32 - d))


def _shift_rows(bm, axis: int, d: int):
    """Occupancy shifted by ``d`` rows along y (axis=1) or z (axis=0):
    out[i] = in[i + d], zeros shifted in at the boundary."""
    if d == 0:
        return bm
    n = bm.shape[axis]
    pad = [(0, 0)] * bm.ndim
    if d > 0:
        sl = [slice(None)] * bm.ndim
        sl[axis] = slice(d, n)
        pad[axis] = (0, d)
    else:
        sl = [slice(None)] * bm.ndim
        sl[axis] = slice(0, n + d)
        pad[axis] = (-d, 0)
    return jnp.pad(bm[tuple(sl)], pad)


_EVEN_MASKS = ((0x33333333, 2), (0x0F0F0F0F, 4), (0x00FF00FF, 8), (0x0000FFFF, 16))


def _extract_even_bits(w):
    """uint32 word -> its 16 even-position bits packed into the low half."""
    x = w & jnp.uint32(0x55555555)
    for m, s in _EVEN_MASKS:
        x = (x | (x >> (s // 2))) & jnp.uint32(m)
    return x


def _bitmap_downsample(bm, in_grid: GridSpec, out_grid: GridSpec,
                       kernel, stride, padding):
    """Strided-conv output active set as a padded bitmap, via pure bit ops.

    out[o] is occupied iff any input cell in its receptive field
    [o*s - p, o*s - p + k - 1] (per dim) is occupied -- SparseConv3d's
    active-set rule -- computed as a shift-OR dilation followed by a
    stride subsample. No candidate enumeration, no sort: the TPU cost is a
    handful of elementwise passes over the ~MB-scale word array (the sort
    path's V*ceil(k/s)^3 candidate build + lax.sort dominated the strided
    rulebook build time).

    Supports stride 1 or 2 per dim (the whole CPD ladder). Returns the
    (nz_out, ny_out, wr_out) uint32 bitmap with padding bits cleared."""
    kx, ky, kz = kernel
    sx, sy, sz = stride
    px, py, pz = padding
    # dilate: t[i] = OR_j in[i + j - p], then out[o] = t[o*s]
    t = None
    for j in range(kz):
        s = _shift_rows(bm, 0, j - pz)
        t = s if t is None else t | s
    bm = t
    t = None
    for j in range(ky):
        s = _shift_rows(bm, 1, j - py)
        t = s if t is None else t | s
    bm = t
    t = None
    for j in range(kx):
        s = _shift_bits_x(bm, j - px)
        t = s if t is None else t | s
    bm = t
    # subsample
    if sz == 2:
        bm = bm[::2]
    if sy == 2:
        bm = bm[:, ::2]
    bm = bm[: out_grid.nz, : out_grid.ny]
    if sx == 2:
        # out bit o <- bit 2o: even-bit-extract, then fuse word pairs
        wr = bm.shape[-1]
        if wr % 2:
            bm = jnp.pad(bm, ((0, 0), (0, 0), (0, 1)))
            wr += 1
        ev = _extract_even_bits(bm)
        bm = ev[..., 0::2] | (ev[..., 1::2] << 16)
    wr_out = -(-out_grid.nx // 32)
    bm = bm[..., :wr_out]
    if bm.shape[-1] < wr_out:  # can't happen for s in (1,2), keep static-safe
        bm = jnp.pad(bm, ((0, 0), (0, 0), (0, wr_out - bm.shape[-1])))
    # clear padding bits (x >= nx_out): receptive fields of nonexistent
    # output columns may have been set by the dilation
    cols = jax.lax.broadcasted_iota(jnp.int32, (wr_out, 32), 0) * 32 \
        + jax.lax.broadcasted_iota(jnp.int32, (wr_out, 32), 1)
    colmask = jnp.sum(
        jnp.where(cols < out_grid.nx,
                  jnp.uint32(1) << (cols & 31).astype(jnp.uint32), jnp.uint32(0)),
        axis=1, dtype=jnp.uint32)
    return bm & colmask


def _keys_from_padded_bitmap(bm, grid: GridSpec, cap: int):
    """(nz, ny, wr) uint32 occupancy -> ((cap,) sorted int32 true-grid keys
    with INVALID_KEY padding, (cap,) bool valid). Two-phase rank compaction
    (word-level compact, then per-bit expansion of <= cap occupied words)
    keeps every scatter under the TPU gather/scatter fast-path cap. Overflow
    beyond ``cap`` drops the HIGHEST keys (the sort path's semantics)."""
    nz, ny, wr = bm.shape
    flat = bm.reshape(-1)
    n_words = flat.shape[0]
    counts = jax.lax.population_count(flat).astype(jnp.int32)
    prefix = jnp.cumsum(counts) - counts  # exclusive rank base per word
    total = prefix[-1] + counts[-1]
    # phase A: each occupied word owns the rank interval
    # [prefix, prefix + count); scatter its id at the interval START (unique:
    # prefix strictly increases across occupied words) and forward-fill, so
    # every output SLOT knows its source word. This is one n_words scatter +
    # a cap-length cummax -- NOT a per-bit scatter: a cap*32-index scatter
    # falls off the TPU fast path above ~2M indices (measured 12x cliff).
    keep = (counts > 0) & (prefix < cap)
    target = jnp.where(keep, prefix, cap)
    widx = jnp.arange(n_words, dtype=jnp.int32)
    starts = jnp.zeros((cap + 1,), jnp.int32).at[target].max(
        widx, mode="drop")[:cap]
    wsel = jax.lax.associative_scan(jnp.maximum, starts)  # word id per slot
    word = flat[wsel]
    pref = prefix[wsel]
    base_true = (wsel // wr) * grid.nx + (wsel % wr) * 32
    # phase B: slot r holds the (r - prefix)-th set bit of its word; find its
    # lane with a 32-lane one-hot select (pure VPU work, no scatter)
    j = jnp.arange(cap, dtype=jnp.int32) - pref  # rank within word
    lanes = jnp.arange(32, dtype=jnp.uint32)[None, :]
    below = (jnp.uint32(1) << lanes) - jnp.uint32(1)
    cum = jax.lax.population_count(word[:, None] & below).astype(jnp.int32)
    bit_set = (word[:, None] >> lanes) & 1
    hit = (cum == j[:, None]) & (bit_set > 0)
    pos = jnp.sum(jnp.where(hit, lanes.astype(jnp.int32), 0), axis=1)
    ok = (jnp.arange(cap) < jnp.minimum(total, cap)) & jnp.any(hit, axis=1)
    out = jnp.where(ok, base_true + pos, INVALID_KEY).astype(jnp.int32)
    return out, ok


def _kernel_offsets(kernel: Tuple[int, int, int]):
    """Static list of (dz, dy, dx) offsets relative to the kernel origin."""
    kx, ky, kz = kernel
    offs = []
    for dz in range(kz):
        for dy in range(ky):
            for dx in range(kx):
                offs.append((dz, dy, dx))
    return offs


class Rulebook(NamedTuple):
    """Gather table: out_features[v] += in_features[idx[v, k]] * found[v, k] @ W[k]."""

    idx: jnp.ndarray  # (V_out_cap, K) int32 into the input voxel table
    found: jnp.ndarray  # (V_out_cap, K) bool
    out_keys: jnp.ndarray  # (V_out_cap,) int32 sorted keys of output voxels
    out_valid: jnp.ndarray  # (V_out_cap,) bool


@partial(jax.jit, static_argnames=("grid", "kernel", "lut_max_cells"))
def build_subm_rulebook(keys, grid: GridSpec, kernel: Tuple[int, int, int] = (3, 3, 3),
                        lut=None, lut_max_cells: int = None) -> Rulebook:
    """Submanifold rulebook: output sites == input sites (SubMConv3d semantics).

    keys: (V_cap,) sorted int32. Each kernel offset's query set is the key
    array plus a constant linearized delta -- still sorted -- so ALL offsets
    resolve in ONE batched rank-join (lookup_sorted_rows). Wraps across grid
    rows are rejected by per-dim bounds checks on the source coordinates.
    """
    kx, ky, kz = kernel
    cx, cy, cz = kx // 2, ky // 2, kz // 2
    coords = coords_from_keys(keys, grid)  # (V, 3) zyx
    valid = keys != INVALID_KEY
    n = keys.shape[0]
    safe_keys = jnp.where(valid, keys, SENTINEL)

    offsets = [(dz - cz, dy - cy, dx - cx) for dz, dy, dx in _kernel_offsets(kernel)]
    arange = jnp.arange(n, dtype=jnp.int32)

    def in_bounds_of(offs_list):
        offs = jnp.asarray(offs_list, jnp.int32)  # (P, 3) zyx
        nc = coords[None, :, :] + offs[:, None, :]
        return (
            (nc[..., 2] >= 0) & (nc[..., 2] < grid.nx)
            & (nc[..., 1] >= 0) & (nc[..., 1] < grid.ny)
            & (nc[..., 0] >= 0) & (nc[..., 0] < grid.nz)
        )

    if lut is not None or grid.num_cells <= (
            DENSE_LUT_MAX_CELLS if lut_max_cells is None else lut_max_cells):
        # LUT path: look up ALL non-center taps directly. Measured (round 2,
        # stage-0 scale, bitmap table): 26 direct packed lookups = 17.6 ms vs
        # 13 positive + the (13, V+1) inversion scatter = 24.9 ms -- the
        # mirror-symmetry trick only pays on the rank-join path below.
        # keep the CENTER tap in the lookup list: excluding it splits the
        # (0,0,*) dx-run into two single-tap runs (one extra fetch pass per
        # cell); the run's single fetch already covers key-1..key+1, and the
        # center column is overridden with the identity row afterward
        if lut is None:
            lut = build_bitmap_lut(keys, grid)
        idx_o, found_o = lookup_packed_taps(
            lut, keys, offsets, grid, in_bounds_of(offsets) & valid[None, :]
        )
        col = {o: k for k, o in enumerate(offsets)}
        idx_cols = [arange if o == (0, 0, 0) else idx_o[col[o]] for o in offsets]
        found_cols = [valid if o == (0, 0, 0) else found_o[col[o]] for o in offsets]
        return Rulebook(
            idx=jnp.stack(idx_cols, axis=1),
            found=jnp.stack(found_cols, axis=1),
            out_keys=keys,
            out_valid=valid,
        )

    # rank-join path (grids above the LUT threshold): resolve only the
    # positive-delta half -- if keys[j] == keys[i] + d then keys[i] ==
    # keys[j] - d, so the negative half is the inverse pair map (one packed
    # scatter) and the (P, V+Q) sort runs at half the rows.
    pos_offsets = [o for o in offsets
                   if (o[0] * grid.ny + o[1]) * grid.nx + o[2] > 0]
    deltas = jnp.asarray(
        [(oz * grid.ny + oy) * grid.nx + ox for oz, oy, ox in pos_offsets], jnp.int32
    )
    in_bounds = in_bounds_of(pos_offsets)
    queries = safe_keys[None, :] + deltas[:, None]  # (P, V) sorted rows
    idx_all, found_all = lookup_sorted_rows(safe_keys, queries)
    found_all = found_all & in_bounds & valid[None, :]

    safe_tgt = jnp.where(found_all, idx_all, n)  # scatter drop slot
    packed = jnp.zeros((len(pos_offsets), n + 1), jnp.int32).at[
        jnp.arange(len(pos_offsets))[:, None], safe_tgt
    ].set(jnp.broadcast_to(arange[None] + 1, found_all.shape))[:, :n]
    found_neg = packed > 0
    idx_neg = jnp.where(found_neg, packed - 1, 0)

    pos_col = {o: k for k, o in enumerate(pos_offsets)}
    idx_cols, found_cols = [], []
    for o in offsets:
        if o == (0, 0, 0):
            idx_cols.append(arange)
            found_cols.append(valid)
        elif o in pos_col:
            idx_cols.append(idx_all[pos_col[o]])
            found_cols.append(found_all[pos_col[o]])
        else:
            mirror = (-o[0], -o[1], -o[2])
            idx_cols.append(idx_neg[pos_col[mirror]])
            found_cols.append(found_neg[pos_col[mirror]])
    return Rulebook(
        idx=jnp.stack(idx_cols, axis=1),
        found=jnp.stack(found_cols, axis=1),
        out_keys=keys,
        out_valid=valid,
    )


def _strided_out_keys_bitmap(keys, grid: GridSpec, out_grid: GridSpec,
                             kernel, stride, padding, out_cap: int):
    """Strided-conv output active set via the padded occupancy bitmap: a
    shift-OR dilation + stride subsample + rank compaction -- pure
    elementwise bit ops over ~MB-scale word arrays instead of the
    V * ceil(k/s)^3 candidate enumeration + lax.sort (which was measured as
    the dominant cost of the strided rulebook builds, STATUS.md round-3
    breakdown). Strides must be 1 or 2 per dim (the whole CPD ladder)."""
    bm = build_padded_bitmap(keys, grid)
    bm_out = _bitmap_downsample(bm, grid, out_grid, kernel, stride, padding)
    return _keys_from_padded_bitmap(bm_out, out_grid, out_cap)


def _strided_out_keys_sort(keys, grid: GridSpec, out_grid: GridSpec,
                           kernel, stride, padding, out_cap: int):
    """Sort-path fallback (any kernel/stride): enumerate the reduced per-dim
    candidate set per input voxel, then sort + unique at static capacity."""
    valid = keys != INVALID_KEY
    kx, ky, kz = kernel
    sx, sy, sz = stride
    px, py, pz = padding
    coords = coords_from_keys(keys, grid)  # (V, 3) zyx

    def dim_candidates(i, k, s, p, out_n):
        """All output coords o with 0 <= i + p - o*s < k, static-size."""
        n_cand = -(-k // s)  # ceil(k/s)
        base = (i + p) // s
        cands = []
        for q in range(n_cand):
            o = base - q
            koff = i + p - o * s
            ok = (koff >= 0) & (koff < k) & (o >= 0) & (o < out_n)
            cands.append((o, ok))
        return cands

    # build candidate output keys: (V * n_cand^3,)
    cand_keys = []
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    for oz, okz in dim_candidates(z, kz, sz, pz, out_grid.nz):
        for oy, oky in dim_candidates(y, ky, sy, py, out_grid.ny):
            for ox, okx in dim_candidates(x, kx, sx, px, out_grid.nx):
                ok = okz & oky & okx & valid
                key = (oz * out_grid.ny + oy) * out_grid.nx + ox
                cand_keys.append(jnp.where(ok, key, INVALID_KEY).astype(jnp.int32))
    cand = jnp.concatenate(cand_keys)  # (V * n_cand^3,)
    # lax.sort (unstable) over jnp.sort: the stable variant is ~2.5x slower
    # on TPU (scripts/exp_r3_vox.py)
    cand = jax.lax.sort(cand)
    first = jnp.concatenate([jnp.array([True]), cand[1:] != cand[:-1]])
    first = first & (cand != INVALID_KEY)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1
    slot = jnp.where(first & (slot < out_cap), slot, out_cap)
    # plain scatter-SET extraction: each kept slot is written by exactly one
    # first-row (measured 8.7 vs segment_max's 12.5 ms at stage-0 scale,
    # scripts/exp_r2m_strided_internals.py)
    out_keys = jnp.full((out_cap + 1,), -1, jnp.int32).at[slot].set(
        cand, mode="drop")[:out_cap]
    out_valid = out_keys >= 0
    out_keys = jnp.where(out_valid, out_keys, INVALID_KEY).astype(jnp.int32)
    return out_keys, out_valid


def build_conv_rulebook(
    keys,
    grid: GridSpec,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
    out_cap: int,
    lut=None,
    lut_max_cells: int = None,
) -> Tuple[Rulebook, GridSpec]:
    out_grid = grid.downsample(stride, padding, kernel)
    rb = _build_conv_rulebook_jit(keys, grid, out_grid, kernel, stride, padding, out_cap, lut,
                                  lut_max_cells)
    return rb, out_grid


@partial(jax.jit, static_argnames=("grid", "out_grid", "kernel", "stride", "padding",
                                   "out_cap", "lut_max_cells"))
def _build_conv_rulebook_jit(
    keys,
    grid: GridSpec,
    out_grid: GridSpec,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
    out_cap: int,
    lut=None,
    lut_max_cells: int = None,
) -> Rulebook:
    """Strided (non-submanifold) rulebook: SparseConv3d semantics.

    Output active set = every output site whose receptive field touches an
    input voxel, derived sort-free from the padded occupancy bitmap
    (:func:`_strided_out_keys_bitmap`; candidate-sort fallback for strides
    above 2), with a static output capacity ``out_cap``.
    kernel/stride/padding are (x, y, z) tuples.
    """
    sx, sy, sz = stride
    px, py, pz = padding
    if max(stride) <= 2:
        out_keys, out_valid = _strided_out_keys_bitmap(
            keys, grid, out_grid, kernel, stride, padding, out_cap)
    else:
        out_keys, out_valid = _strided_out_keys_sort(
            keys, grid, out_grid, kernel, stride, padding, out_cap)

    # for each output voxel and kernel tap, find the contributing input voxel:
    # input coord = out*s - p + tap. The arithmetic (unclipped) input key is a
    # strictly increasing function of the output key, so every tap's query row
    # is sorted and ONE batched rank-join resolves all taps; out-of-bounds
    # input coordinates are rejected afterwards.
    out_coords = coords_from_keys(out_keys, out_grid)  # (Vo, 3) zyx
    offs = jnp.asarray(_kernel_offsets(kernel), jnp.int32)  # (K, 3) zyx taps
    ic = jnp.stack([
        out_coords[:, 0] * sz - pz,
        out_coords[:, 1] * sy - py,
        out_coords[:, 2] * sx - px,
    ], axis=-1)[None, :, :] + offs[:, None, :]  # (K, Vo, 3)
    qkeys = (ic[..., 0] * grid.ny + ic[..., 1]) * grid.nx + ic[..., 2]
    in_bounds = (
        (ic[..., 2] >= 0) & (ic[..., 2] < grid.nx)
        & (ic[..., 1] >= 0) & (ic[..., 1] < grid.ny)
        & (ic[..., 0] >= 0) & (ic[..., 0] < grid.nz)
    ) & out_valid[None, :]
    if lut is not None or grid.num_cells <= (
            DENSE_LUT_MAX_CELLS if lut_max_cells is None else lut_max_cells):
        if lut is None:
            lut = build_bitmap_lut(keys, grid)
        # tap query cells are base + const delta (base = strided origin cell),
        # so the run-packed lookup applies: 18 wide row gathers for a 27-tap
        # kernel instead of 27 narrow ones
        base = (
            (out_coords[:, 0] * sz - pz) * grid.ny + (out_coords[:, 1] * sy - py)
        ) * grid.nx + (out_coords[:, 2] * sx - px)
        idx_all, found_all = lookup_packed_taps(
            lut, base.astype(jnp.int32), _kernel_offsets(kernel), grid, in_bounds
        )
    else:
        qk = jnp.where(in_bounds, qkeys, SENTINEL).astype(jnp.int32)
        safe_keys = jnp.where(keys != INVALID_KEY, keys, SENTINEL)
        idx_all, found_all = lookup_sorted_rows(safe_keys, qk)
        found_all = found_all & in_bounds
    return Rulebook(
        idx=jnp.transpose(idx_all),
        found=jnp.transpose(found_all),
        out_keys=out_keys,
        out_valid=out_valid,
    )


def build_inverse_rulebook(
    in_keys,
    out_keys,
    grid: GridSpec,
    out_grid: GridSpec,
    kernel: Tuple[int, int, int],
    stride: Tuple[int, int, int],
    padding: Tuple[int, int, int],
    out_lut=None,
    lut_max_cells: int = None,
) -> Rulebook:
    """Transpose of a strided-conv rulebook, per-tap aligned.

    For input voxel u and kernel tap k, ``idx[u, k]`` is the OUTPUT row v such
    that the forward rulebook had ``fwd.idx[v, k] == u`` (i.e. output site
    o = (u + p - tap_k) / s when divisible), and ``found[u, k]`` marks
    existence. This lets the conv backward compute dX as a gather-GEMM
    (dX[u] = sum_k found[u,k] * dY[idx[u,k]] @ W[k]^T) instead of the
    scatter-add XLA autodiff would emit -- the transpose of
    spconv's SparseInverseConv3d indexing, built TPU-style with LUT/rank-join
    lookups (no hash tables).
    """
    kx, ky, kz = kernel
    sx, sy, sz = stride
    px, py, pz = padding
    coords = coords_from_keys(in_keys, grid)  # (V, 3) zyx
    valid = in_keys != INVALID_KEY
    offs = jnp.asarray(_kernel_offsets(kernel), jnp.int32)  # (K, 3) zyx taps
    num = coords[None, :, :] + jnp.asarray([[pz, py, px]], jnp.int32)[None] - offs[:, None, :]
    s = jnp.asarray([sz, sy, sx], jnp.int32)
    divisible = jnp.all(num % s == 0, axis=-1)
    oc = num // s  # (K, V, 3) candidate output coords
    in_bounds = (
        (oc[..., 2] >= 0) & (oc[..., 2] < out_grid.nx)
        & (oc[..., 1] >= 0) & (oc[..., 1] < out_grid.ny)
        & (oc[..., 0] >= 0) & (oc[..., 0] < out_grid.nz)
    )
    ok = divisible & in_bounds & valid[None, :]
    qkeys = ((oc[..., 0] * out_grid.ny + oc[..., 1]) * out_grid.nx + oc[..., 2]).astype(jnp.int32)
    if out_lut is not None or out_grid.num_cells <= (
            DENSE_LUT_MAX_CELLS if lut_max_cells is None else lut_max_cells):
        lut = out_lut if out_lut is not None else build_bitmap_lut(out_keys, out_grid)
        if lut.shape[-1] == 3 and kx == 3 and sx <= 2:
            # dx-triples of a stride<=2 transpose map to <= 2 consecutive
            # output cells (o_x = (x + p - dx)/s), so one bitmap-row fetch
            # serves each triple: K/3 latency-bound fetches instead of K
            idx_all, found_all = lookup_bitmap_runs_dynamic(lut, qkeys, ok)
        else:
            idx_all, found_all = lookup_dense_rows(lut, qkeys, ok)
    else:
        # output key is monotone nondecreasing in the input key per tap, so
        # each row is sorted and the batched rank-join applies
        qk = jnp.where(ok, qkeys, SENTINEL)
        safe_out = jnp.where(out_keys != INVALID_KEY, out_keys, SENTINEL)
        idx_all, found_all = lookup_sorted_rows(safe_out, qk)
        found_all = found_all & ok
    return Rulebook(
        idx=jnp.transpose(idx_all),
        found=jnp.transpose(found_all),
        out_keys=in_keys,
        out_valid=valid,
    )


def build_inverse_rulebook_batched(in_keys, out_keys, grid: GridSpec, out_grid: GridSpec,
                                   kernel, stride, padding, out_lut=None,
                                   lut_max_cells: int = None) -> Rulebook:
    """vmap of build_inverse_rulebook over a leading batch axis.
    B == 1 runs squeezed (see build_subm_rulebook_batched)."""
    fn = partial(_build_inverse_rulebook_jit, grid=grid, out_grid=out_grid,
                 kernel=kernel, stride=stride, padding=padding,
                 lut_max_cells=lut_max_cells)
    if in_keys.shape[0] == 1:
        return _expand1(fn(in_keys[0], out_keys[0],
                           out_lut=None if out_lut is None else out_lut[0]))
    if out_lut is None:
        return jax.vmap(lambda i, o: fn(i, o))(in_keys, out_keys)
    return jax.vmap(lambda i, o, l: fn(i, o, out_lut=l))(in_keys, out_keys, out_lut)


@partial(jax.jit, static_argnames=("grid", "out_grid", "kernel", "stride", "padding",
                                   "lut_max_cells"))
def _build_inverse_rulebook_jit(in_keys, out_keys, grid, out_grid, kernel, stride, padding,
                                out_lut=None, lut_max_cells=None):
    return build_inverse_rulebook(in_keys, out_keys, grid, out_grid, kernel, stride, padding,
                                  out_lut, lut_max_cells)


def gather_rows_per_tap(features, idx, found):
    """Masked im2col built as K PER-TAP gathers: (B, V, C) x (B, N, K) ->
    (B, N, K, C).

    Measured on TPU v5e: one flattened (N*K,)-row gather lowers to a
    ~6.5 cycles/row scalar path (26 ms at stage-1 scale), while K separate
    (N,)-row gathers run near memory bandwidth (2.2 ms) -- 12x. Never emit
    the flattened form on the conv path.
    """
    k = idx.shape[-1]
    cols = [
        jnp.take_along_axis(features, idx[:, :, t][..., None], axis=1)
        for t in range(k)
    ]
    gathered = jnp.stack(cols, axis=2)  # (B, N, K, C)
    return jnp.where(found[..., None], gathered, 0)


def gather_rows_tap_major(features, idx, found):
    """Masked im2col as K per-tap gathers in TAP-MAJOR layout:
    (B, V, C) x (B, N, K) -> (B, K, N, C).

    Per-tap (N,)-row gathers run ~12x faster than one flattened (N*K,) gather
    (XLA's fast path caps at ~2M indices), and the tap-major stack avoids the
    strided interleave writes of a (N, K, C) layout -- the downstream GEMM
    contracts (K, C) directly via dot_general dimension numbers."""
    k = idx.shape[-1]
    cols = [
        jnp.take_along_axis(features, idx[:, :, t][..., None], axis=1)
        for t in range(k)
    ]
    gathered = jnp.stack(cols, axis=1)  # (B, K, N, C)
    return jnp.where(jnp.swapaxes(found, 1, 2)[..., None], gathered, 0)


# below this many total indices, ONE flattened (B*N*K,)-row gather beats the
# K per-tap gathers: XLA's gather fast path holds and the single op saves K-1
# dispatch latencies (measured, scripts/exp_r2h_gather2.py: subm3 48k*27
# flattened 9.6 vs per-tap 19.6 ms, subm4 24k*27: 4.8 vs 8.6; above the ~2M
# fast-path cap the flattened form falls off a cliff -- subm1 120k*27: 14.0
# vs 11.2 -- so the deep stages flatten and the wide stages stay per-tap)
FLAT_GATHER_MAX_IDX = 1_500_000


def gather_rows_flat(features, idx, found):
    """Masked im2col as ONE flattened row gather: (B, V, C) x (B, N, K) ->
    (B, N, K, C). Only use below FLAT_GATHER_MAX_IDX total indices."""
    b, v, c = features.shape
    off = (jnp.arange(b, dtype=idx.dtype) * v)[:, None, None]
    g = features.reshape(b * v, c)[(idx + off).reshape(-1)]
    g = g.reshape(b, idx.shape[1], idx.shape[2], c)
    return jnp.where(found[..., None], g, 0)


def gather_rows_windowed(features, idx, found, flat=False):
    """Masked im2col via dx-RUN window gathers: (B, V, C) x (B, N, K) ->
    (B, N, K, C), for rulebooks whose K taps are ordered dx-fastest in runs
    of 3 consecutive dx (the ``_kernel_offsets`` order of any kernel with
    kx == 3; K must be a multiple of 3).

    The im2col gathers are HBM-TRANSACTION-bound (~3.5-6 ns/row at C <= 64
    regardless of row width). Within a dx-run the gather rows are RANKS of 3
    CONSECUTIVE keys in the sorted key table, so max(idx) - min(idx) <= 2
    among found taps (at most two occupied cells can separate keys k-1 and
    k+1). One (3C)-wide row fetched from a shifted-concat window table
    therefore covers the whole run: K/3 gathers instead of K, with the
    per-tap block selected by two vectorized where's. Measured
    (scripts/exp_r2j_window_gather.py, bf16 incl. the conv GEMM): 2.75x at
    stage-1 scale (120k x 27, C=16: 7.6 vs 20.8 ms per-tap), 1.26x at
    stage 2 (flat variant), 1.18x at stage 3; C=128 prefers flat/per-tap.

    The rank-adjacency invariant holds for every rulebook built here (subm,
    strided forward, mirror-transpose, inverse): all derive idx as the rank
    of ``base_key + static_delta`` with dx-major tap order.
    """
    b, v, c = features.shape
    n, k = idx.shape[1], idx.shape[2]
    assert k % 3 == 0, "windowed gather requires dx-runs of 3"
    g = k // 3
    shift1 = jnp.pad(features[:, 1:], ((0, 0), (0, 1), (0, 0)))
    shift2 = jnp.pad(features[:, 2:], ((0, 0), (0, 2), (0, 0)))
    wtab = jnp.concatenate([features, shift1, shift2], axis=-1)  # (B, V, 3C)
    idx_g = idx.reshape(b, n, g, 3)
    found_g = found.reshape(b, n, g, 3)
    big = jnp.where(found_g, idx_g, jnp.int32(1 << 30))
    base = jnp.min(big, axis=-1)  # (b, n, g) rank of the run's smallest found key
    base = jnp.where(jnp.any(found_g, -1), base, 0)
    base = jnp.minimum(base, v - 1)
    if flat:
        off = (jnp.arange(b, dtype=base.dtype) * v)[:, None, None]
        wins = wtab.reshape(b * v, 3 * c)[(base + off).reshape(-1)]
        wins = wins.reshape(b, n, g, 3, c)
    else:
        cols = [jnp.take_along_axis(wtab, base[:, :, j][..., None], axis=1)
                for j in range(g)]
        wins = jnp.stack(cols, axis=2).reshape(b, n, g, 3, c)
    d = jnp.clip(idx_g - base[..., None], 0, 2)[..., None]  # (b, n, g, 3, 1)
    sel = jnp.where(d == 0, wins[:, :, :, 0:1, :],
                    jnp.where(d == 1, wins[:, :, :, 1:2, :],
                              wins[:, :, :, 2:3, :]))
    sel = jnp.where(found_g[..., None], sel, 0)
    return sel.reshape(b, n, k, c)


# grouped im2col gathers pack this many indices into one take_along_axis op.
# The im2col phase is DISPATCH-bound once the windowed/per-tap forms hold the
# transaction count down: win issues K/3 ops and per-tap K ops per gather,
# each op paying fixed dispatch latency. Packing G windows/taps per op keeps
# the same bytes and rows but ~G-fold fewer ops. Tied to FLAT_GATHER_MAX_IDX
# (the repo's one conservative bound for the XLA gather fast-path cliff,
# measured ~2M: 26 ms at 4M vs 3.8 at 2M indices) so the two "gather cliff"
# constants cannot drift apart.
GATHER_GROUP_BUDGET = FLAT_GATHER_MAX_IDX


def gather_rows_windowed_grouped(features, idx, found,
                                 budget: int = GATHER_GROUP_BUDGET):
    """:func:`gather_rows_windowed` with the K/3 window gathers PACKED into
    ceil(B*N*(K/3)/budget) take_along_axis ops (same fetched rows, ~G-fold
    fewer dispatches). (B, V, C) x (B, N, K) -> (B, N, K, C)."""
    b, v, c = features.shape
    n, k = idx.shape[1], idx.shape[2]
    assert k % 3 == 0, "windowed gather requires dx-runs of 3"
    g = k // 3
    shift1 = jnp.pad(features[:, 1:], ((0, 0), (0, 1), (0, 0)))
    shift2 = jnp.pad(features[:, 2:], ((0, 0), (0, 2), (0, 0)))
    wtab = jnp.concatenate([features, shift1, shift2], axis=-1)  # (B, V, 3C)
    idx_g = idx.reshape(b, n, g, 3)
    found_g = found.reshape(b, n, g, 3)
    big = jnp.where(found_g, idx_g, jnp.int32(1 << 30))
    base = jnp.min(big, axis=-1)  # (b, n, g) rank of the run's smallest found key
    base = jnp.where(jnp.any(found_g, -1), base, 0)
    base = jnp.minimum(base, v - 1)
    gper = max(1, budget // (b * n))
    cols = []
    for j0 in range(0, g, gper):
        gi = base[:, :, j0:j0 + gper]
        gg = gi.shape[-1]
        w = jnp.take_along_axis(wtab, gi.reshape(b, n * gg)[..., None], axis=1)
        cols.append(w.reshape(b, n, gg, 3 * c))
    wins = jnp.concatenate(cols, axis=2).reshape(b, n, g, 3, c)
    d = jnp.clip(idx_g - base[..., None], 0, 2)[..., None]  # (b, n, g, 3, 1)
    sel = jnp.where(d == 0, wins[:, :, :, 0:1, :],
                    jnp.where(d == 1, wins[:, :, :, 1:2, :],
                              wins[:, :, :, 2:3, :]))
    sel = jnp.where(found_g[..., None], sel, 0)
    return sel.reshape(b, n, k, c)


def gather_rows_tap_grouped(features, idx, found,
                            budget: int = GATHER_GROUP_BUDGET):
    """Per-tap im2col with the K tap gathers PACKED into
    ceil(B*N*K/budget) take_along_axis ops. (B, V, C) x (B, N, K) ->
    (B, N, K, C) (row-major layout, unlike :func:`gather_rows_tap_major`)."""
    b, v, c = features.shape
    n, k = idx.shape[1], idx.shape[2]
    gper = max(1, budget // (b * n))
    outs = []
    for t0 in range(0, k, gper):
        gi = idx[:, :, t0:t0 + gper]
        gg = gi.shape[-1]
        w = jnp.take_along_axis(features, gi.reshape(b, n * gg)[..., None],
                                axis=1)
        outs.append(w.reshape(b, n, gg, c))
    g = jnp.concatenate(outs, axis=2)
    return jnp.where(found[..., None], g, 0)


def _im2col_mode(idx_size, c, win_run):
    """Static im2col formulation choice, measured on-chip IN CONTEXT (4-5 conv
    chains on real-frame rulebooks, scripts/exp_r2l_stage2_modes.py): windowed
    wins everywhere C <= 64 (stage2 4x chain: win 18.8 / per-tap 28.6 /
    win-flat 47.0 ms -- the standalone probe exp_r2j had picked win-flat);
    at C >= 128 the wide rows amortize the fetch latency and the GROUPED
    per-tap form wins (all K taps in one <=2M-index take_along_axis per
    sample: stage4 4x chain batch 4, scripts/exp_r3_grouped_gather.py:
    ps tap-g 45.6 vs tap-major 80.8 vs per-sample win 70.0 ms; grouping
    LOSES at C <= 64 where the windowed fetches are already wide)."""
    if win_run == 3 and c <= 64:
        return "win"
    if c >= 128:
        return "tap-g"
    return "flat" if idx_size <= FLAT_GATHER_MAX_IDX else "per-tap"


# decompose batched im2col gathers into per-sample gathers above this
# per-sample index count: XLA's leading-batch-dim gather lowers ~2x slower
# than the SAME gathers issued per sample (measured on v5e,
# scripts/exp_r3_flat_gather.py: 4-conv chains at batch 4 run 130-157 ms
# batched vs 58-68 ms as four batch-1 slices at stages 1-3). Tiny configs
# (unit tests, the multichip dryrun) stay batched so their compiled op
# count -- and compile time -- is unchanged.
PER_SAMPLE_GATHER_MIN_IDX = 200_000

# Per-sample unrolls slice the GLOBAL batch axis at trace time. Under a
# batch-sharded mesh (pjit data parallelism, parallel/trainer.py) every
# x[i:i+1] slice crosses DP shard boundaries, so GSPMD must reshard or
# replicate each per-sample build and the hot path can serialize across
# devices -- the single-chip unroll win does NOT transfer. The batched
# (vmapped) lowerings partition cleanly along the sharded batch axis, so
# sharded tracing keeps them: the trainer enters ``batch_unroll_disabled()``
# around the step body when a data mesh is active, and every b>1 unroll
# gate (here, backbone3d.build_branch_rulebooks, pool.unrolled_vmap)
# consults ``batch_unroll_allowed()`` at trace time. b==1 squeezes
# (vmap_squeeze1) stay: a size-1 axis cannot be sharded >1-way.
_BATCH_UNROLL_DISABLED = [0]
_UNROLL_EVENTS = [0]  # per-sample unrolls taken at trace time (test hook)


@contextmanager
def batch_unroll_disabled():
    """Disable b>1 per-sample unrolls for traces entered in this context
    (used by the sharded trainer; the flag is read at TRACE time)."""
    _BATCH_UNROLL_DISABLED[0] += 1
    try:
        yield
    finally:
        _BATCH_UNROLL_DISABLED[0] -= 1


def batch_unroll_allowed() -> bool:
    return _BATCH_UNROLL_DISABLED[0] == 0


def _note_unroll():
    _UNROLL_EVENTS[0] += 1


def _win_gather_2d(features, idx, found, flat=False):
    """gather_rows_windowed on SQUEEZED (V, C) / (N, K) operands."""
    v, c = features.shape
    n, k = idx.shape
    assert k % 3 == 0, "windowed gather requires dx-runs of 3"
    g = k // 3
    shift1 = jnp.pad(features[1:], ((0, 1), (0, 0)))
    shift2 = jnp.pad(features[2:], ((0, 2), (0, 0)))
    wtab = jnp.concatenate([features, shift1, shift2], axis=-1)  # (V, 3C)
    idx_g = idx.reshape(n, g, 3)
    found_g = found.reshape(n, g, 3)
    big = jnp.where(found_g, idx_g, jnp.int32(1 << 30))
    base = jnp.min(big, axis=-1)
    base = jnp.where(jnp.any(found_g, -1), base, 0)
    base = jnp.minimum(base, v - 1)
    if flat:
        wins = wtab[base.reshape(-1)].reshape(n, g, 3, c)
    else:
        cols = [wtab[base[:, j]] for j in range(g)]
        wins = jnp.stack(cols, axis=1).reshape(n, g, 3, c)
    d = jnp.clip(idx_g - base[..., None], 0, 2)[..., None]  # (n, g, 3, 1)
    sel = jnp.where(d == 0, wins[:, :, 0:1, :],
                    jnp.where(d == 1, wins[:, :, 1:2, :],
                              wins[:, :, 2:3, :]))
    sel = jnp.where(found_g[..., None], sel, 0)
    return sel.reshape(n, k, c)


def _gather_by_mode_2d(features, idx, found, mode):
    """_gather_by_mode on SQUEEZED (V, C) / (N, K) operands: XLA lowers the
    2-D gathers measurably faster than the same ops with a leading batch dim
    of ONE (scripts/exp_r4_squeeze.py, 4-conv chains on real-frame rulebooks:
    stage1 16.0 -> 13.8 ms, stage2 21.3 -> 17.0, stage3 19.2 -> 18.8).
    Returns (N, K, C); 'per-tap' returns tap-major (K, N, C)."""
    n, k = idx.shape
    c = features.shape[-1]
    if mode in ("win", "win-flat", "win-g"):
        # win-g's grouping is a batched-dispatch concern; squeezed it is the
        # plain windowed form (same values)
        return _win_gather_2d(features, idx, found, flat=(mode == "win-flat"))
    if mode == "flat":
        g = features[idx.reshape(-1)].reshape(n, k, c)
        return jnp.where(found[..., None], g, 0)
    if mode == "tap-g":
        gper = max(1, GATHER_GROUP_BUDGET // n)
        outs = []
        for t0 in range(0, k, gper):
            gi = idx[:, t0:t0 + gper]
            gg = gi.shape[-1]
            outs.append(features[gi.reshape(-1)].reshape(n, gg, c))
        g = jnp.concatenate(outs, axis=1)
        return jnp.where(found[..., None], g, 0)
    # per-tap, tap-major layout (K, N, C)
    cols = [features[idx[:, t]] for t in range(k)]
    g = jnp.stack(cols, axis=0)
    return jnp.where(found.T[..., None], g, 0)


def _gather_by_mode(features, idx, found, mode):
    """Dispatch to the chosen im2col formulation; all return (B, N, K, C)
    except 'per-tap' which returns the tap-major (B, K, N, C) layout.

    Batch handling (both measured, scripts/exp_r3_flat_gather.py and
    exp_r4_squeeze.py): batches decompose into per-sample gathers above
    PER_SAMPLE_GATHER_MIN_IDX, and single samples run on SQUEEZED 2-D
    operands (a leading batch dim of ONE alone costs 2-14%)."""
    b = features.shape[0]
    if (b > 1 and idx.size // b >= PER_SAMPLE_GATHER_MIN_IDX
            and batch_unroll_allowed()):
        _note_unroll()
        outs = [_gather_by_mode(features[i:i + 1], idx[i:i + 1],
                                found[i:i + 1], mode) for i in range(b)]
        return jnp.concatenate(outs, axis=0)
    if b == 1:
        out = _gather_by_mode_2d(features[0], idx[0], found[0], mode)
        return out[None]
    if mode == "win":
        return gather_rows_windowed(features, idx, found, flat=False)
    if mode == "win-g":
        return gather_rows_windowed_grouped(features, idx, found)
    if mode == "win-flat":
        return gather_rows_windowed(features, idx, found, flat=True)
    if mode == "flat":
        return gather_rows_flat(features, idx, found)
    if mode == "tap-g":
        return gather_rows_tap_grouped(features, idx, found)
    return gather_rows_tap_major(features, idx, found)


def _gather_gemm(features, idx, found, weights, compute_dtype, out_dtype=jnp.float32,
                 win_run=1):
    """Masked im2col gather + one GEMM. features (B, V_in, C); idx/found
    (B, V_out, K); weights (K, C, Cout) -> (B, V_out, Cout) in ``out_dtype``.

    ``out_dtype=bfloat16`` runs the tall-skinny GEMM ~2x faster on TPU
    (measured 1.56 vs 2.87 ms at stage-1 scale) and halves activation
    memory; keep float32 where accumulation accuracy matters (dW)."""
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    mode = _im2col_mode(idx.size, features.shape[-1], win_run)
    gathered = _gather_by_mode(features, idx, found, mode)
    if mode == "per-tap":  # (B, K, N, C)
        return jax.lax.dot_general(
            gathered, weights,
            dimension_numbers=(((1, 3), (0, 1)), ((), ())),
            preferred_element_type=out_dtype,
        )  # (B, N, Cout)
    return jax.lax.dot_general(
        gathered, weights,  # (B, N, K, C)
        dimension_numbers=(((2, 3), (0, 1)), ((), ())),
        preferred_element_type=out_dtype,
    )  # (B, N, Cout)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _sparse_conv_core(compute_dtype, mirror, out_dtype, win_run, features, weights,
                      idx, found, out_valid, t_idx, t_found):
    """Sparse conv with a gather-only backward (custom VJP).

    XLA's autodiff of the im2col gather emits a (B, V*K)-row scatter-add for
    dX -- the dominant cost of the reference-parity training step on TPU.
    Here dX is instead computed with the TRANSPOSE rulebook (t_idx/t_found;
    for submanifold convs ``mirror=True`` reuses the forward rulebook with
    tap columns reversed), and dW re-gathers the im2col and contracts it
    against dY: all gathers + MXU GEMMs, zero scatters.
    """
    return _gather_gemm(features, idx, found, weights, compute_dtype, out_dtype,
                        win_run)


def _sparse_conv_core_fwd(compute_dtype, mirror, out_dtype, win_run, features, weights,
                          idx, found, out_valid, t_idx, t_found):
    out = _sparse_conv_core(compute_dtype, mirror, out_dtype, win_run, features, weights,
                            idx, found, out_valid, t_idx, t_found)
    return out, (features, weights, idx, found, out_valid, t_idx, t_found)


def _sparse_conv_core_bwd(compute_dtype, mirror, out_dtype, win_run, res, g):
    """Backward = ONE transpose-rulebook gather + two GEMMs, zero scatters.

    With gt[u, k] = t_found[u,k] ? dY[t_idx[u,k]] : 0 (the per-tap transpose
    gather of the cotangent):
      dX[u]      = sum_k gt[u, k] @ W[k]^T
      dW[k,c,d]  = sum_{b,u} X[b,u,c] * gt[b,u,k,d]
    The dW identity re-indexes the forward sum v->u = idx[v,k] through the
    per-tap-injective transpose map, so the forward im2col never needs to be
    recomputed (or worse, CSE-kept alive by XLA as a 0.5 GB residual per
    layer, which is what a re-gather formulation does under remat=False).
    """
    features, weights, idx, found, out_valid, t_idx, t_found = res
    k, cin, cout = weights.shape
    b, v_in, _ = t_idx.shape
    g = jnp.where(out_valid[..., None], g, 0.0)
    if mirror:
        # submanifold: transpose rulebook = same table, taps reversed
        t_idx = idx[..., ::-1]
        t_found = found[..., ::-1]
    gg = g.astype(compute_dtype) if compute_dtype is not None else g
    w_t = jnp.transpose(weights, (0, 2, 1))
    if compute_dtype is not None:
        w_t = w_t.astype(compute_dtype)
    feats = features.astype(compute_dtype) if compute_dtype is not None else features
    # mirror reversal keeps the dx-run grouping: K % 3 == 0 and a full
    # reversal maps run boundaries to run boundaries (order within a run is
    # irrelevant to the window base/delta construction)
    mode = _im2col_mode(t_idx.size, gg.shape[-1], win_run)
    gt = _gather_by_mode(gg, t_idx, t_found, mode)
    if mode == "per-tap":  # gt (B, K, V_in, Cout)
        # dX: contract (K, Cout) against W^T (K, Cout, Cin)
        dx = jax.lax.dot_general(
            gt, w_t,
            dimension_numbers=(((1, 3), (0, 1)), ((), ())),
            preferred_element_type=features.dtype,  # bf16 dX when activations are bf16
        ).astype(features.dtype)
        # dW: contract (b, u) between X (B,V,Cin) and gt (B,K,V,Cout) -> (Cin,K,Cout)
        dw = jax.lax.dot_general(
            feats, gt,
            dimension_numbers=(((0, 1), (0, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Cin, K, Cout)
    else:  # gt (B, V_in, K, Cout)
        dx = jax.lax.dot_general(
            gt, w_t,
            dimension_numbers=(((2, 3), (0, 1)), ((), ())),
            preferred_element_type=features.dtype,
        ).astype(features.dtype)
        dw = jax.lax.dot_general(
            feats, gt,
            dimension_numbers=(((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Cin, K, Cout)
    dw = jnp.transpose(dw, (1, 0, 2)).astype(weights.dtype)
    return dx, dw, None, None, None, None, None


_sparse_conv_core.defvjp(_sparse_conv_core_fwd, _sparse_conv_core_bwd)


def sparse_conv_apply(features, rulebook: Rulebook, weights, bias=None,
                      compute_dtype=None):
    """Apply a (subm or strided) sparse conv given its rulebook.

    features: (V_in_cap, Cin); weights: (K, Cin, Cout) -> (V_out_cap, Cout).

    im2col formulation: one gather into (V_out, K*Cin) then a single GEMM
    with the (K*Cin, Cout) reshaped weights -- an MXU-sized contraction.
    """
    v_out, k = rulebook.idx.shape
    cin = features.shape[-1]
    cout = weights.shape[-1]
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    # per-tap gathers (see gather_rows_per_tap: 12x over the flattened form)
    gathered = jnp.stack([features[rulebook.idx[:, t]] for t in range(k)], axis=1)
    gathered = jnp.where(rulebook.found[..., None], gathered, 0)
    out = jax.lax.dot_general(
        gathered.reshape(v_out, k * cin),
        weights.reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return jnp.where(rulebook.out_valid[:, None], out, 0.0)


def sparse_conv_apply_batched(features, rulebook: Rulebook, weights, bias=None,
                              compute_dtype=None, transpose=None,
                              out_dtype=jnp.float32, win_run=1):
    """Batched sparse conv: features (B, V_in, Cin), rulebook fields with a
    leading batch axis -> (B, V_out, Cout). One big (B*V_out, K*Cin) GEMM.

    ``compute_dtype=jnp.bfloat16`` halves the im2col gather traffic (the HBM
    bottleneck of the layer) and runs the GEMM at full MXU rate; accumulation
    stays f32 via preferred_element_type.

    ``win_run=3`` enables the windowed dx-run gather
    (:func:`gather_rows_windowed`) -- pass it iff the rulebook's kernel has
    kx == 3 (taps ordered dx-fastest in runs of 3, e.g. any 3x3x3 kernel;
    NOT the (1,1,3) conv_out kernel whose taps step dz).

    ``transpose`` selects the gather-only custom-VJP backward (no scatters):
      * ``'mirror'`` -- submanifold convs: the transpose rulebook is the
        forward one with tap columns reversed.
      * a ``Rulebook`` from :func:`build_inverse_rulebook_batched` -- strided
        convs.
      * ``None`` -- plain XLA autodiff (scatter-add backward; oracle path).
    """
    if transpose is not None:
        mirror = isinstance(transpose, str)
        if mirror:
            assert transpose == "mirror"
            # tap reversal == offset negation ONLY for all-odd kernels
            # (lexicographic reversal maps (dz,dy,dx) -> (k-1-dz, ...), which
            # negates center-relative offsets iff every kernel dim is odd;
            # the kernel volume K is odd iff all dims are odd)
            assert rulebook.idx.shape[-1] % 2 == 1, (
                "mirror transpose requires an all-odd kernel (volume "
                f"{rulebook.idx.shape[-1]} is even); build an explicit "
                "inverse rulebook instead"
            )
            t_idx, t_found = rulebook.idx, rulebook.found
        else:
            t_idx, t_found = transpose.idx, transpose.found
        out = _sparse_conv_core(
            compute_dtype, mirror, jnp.dtype(out_dtype), win_run, features, weights,
            rulebook.idx, rulebook.found, rulebook.out_valid, t_idx, t_found,
        )
        if bias is not None:
            out = out + bias
        return jnp.where(rulebook.out_valid[..., None], out, 0.0)
    b, v_out, k = rulebook.idx.shape
    if compute_dtype is not None:
        features = features.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    # honor out_dtype here too: eval (with_transpose=False) must keep the
    # bf16 activation dtype of the training path (f32 MXU accumulation is
    # internal regardless of the result dtype)
    out = _gather_gemm(features, rulebook.idx, rulebook.found, weights,
                       None, jnp.dtype(out_dtype), win_run)
    if bias is not None:
        out = out + bias
    return jnp.where(rulebook.out_valid[..., None], out, 0.0)


def _expand1(tree):
    return jax.tree_util.tree_map(lambda x: x[None], tree)


def vmap_squeeze1(fn, *args):
    """``jax.vmap(fn)(*args)`` that calls ``fn`` directly on squeezed
    operands when the leading axis is 1: a leading batch dim of ONE alone
    slows XLA's gather/scatter lowerings (scripts/exp_r4_squeeze.py), and
    the batch-1 inference path is the throughput benchmark."""
    if args[0].shape[0] == 1:
        return _expand1(fn(*(a[0] for a in args)))
    return jax.vmap(fn)(*args)


def build_subm_rulebook_batched(keys, grid: GridSpec, kernel=(3, 3, 3), lut=None,
                                lut_max_cells: int = None) -> Rulebook:
    """vmap of build_subm_rulebook over a leading batch axis of keys (B, V).

    At B == 1 the builder runs SQUEEZED (no vmap): a leading batch dim of
    one alone slows the internal gathers (scripts/exp_r4_squeeze.py)."""
    if keys.shape[0] == 1:
        return _expand1(build_subm_rulebook(
            keys[0], grid, kernel, None if lut is None else lut[0],
            lut_max_cells))
    if lut is None:
        return jax.vmap(
            lambda k: build_subm_rulebook(k, grid, kernel, lut_max_cells=lut_max_cells)
        )(keys)
    return jax.vmap(
        lambda k, l: build_subm_rulebook(k, grid, kernel, l, lut_max_cells)
    )(keys, lut)


def build_conv_rulebook_batched(keys, grid: GridSpec, kernel, stride, padding, out_cap,
                                lut=None, lut_max_cells: int = None):
    """vmap of build_conv_rulebook over batch; returns (Rulebook with B axis, out_grid).
    B == 1 runs squeezed (see build_subm_rulebook_batched)."""
    out_grid = grid.downsample(stride, padding, kernel)
    if keys.shape[0] == 1:
        rb = _expand1(_build_conv_rulebook_jit(
            keys[0], grid, out_grid, kernel, stride, padding, out_cap,
            None if lut is None else lut[0], lut_max_cells))
        return rb, out_grid
    if lut is None:
        rb = jax.vmap(
            lambda k: _build_conv_rulebook_jit(k, grid, out_grid, kernel, stride, padding,
                                               out_cap, lut_max_cells=lut_max_cells)
        )(keys)
    else:
        rb = jax.vmap(
            lambda k, l: _build_conv_rulebook_jit(k, grid, out_grid, kernel, stride, padding,
                                                  out_cap, l, lut_max_cells)
        )(keys, lut)
    return rb, out_grid


def build_dense_lut_batched(keys, grid: GridSpec):
    """vmap of build_dense_lut: (B, V) keys -> (B, num_cells) int32."""
    if keys.shape[0] == 1:
        return build_dense_lut(keys[0], grid)[None]
    return jax.vmap(lambda k: build_dense_lut(k, grid))(keys)


def build_bitmap_lut_batched(keys, grid: GridSpec):
    """vmap of build_bitmap_lut: (B, V) keys -> (B, words, 3) int32."""
    if keys.shape[0] == 1:
        return build_bitmap_lut(keys[0], grid)[None]
    return jax.vmap(lambda k: build_bitmap_lut(k, grid))(keys)


@partial(jax.jit, static_argnames=("grid", "channels"))
def to_dense(features, keys, grid: GridSpec, channels: int):
    """Scatter a sparse tensor into a dense (nz, ny, nx, C) grid (spconv .dense())."""
    valid = keys != INVALID_KEY
    safe_keys = jnp.where(valid, keys, 0)
    dense = jnp.zeros((grid.num_cells, channels), dtype=features.dtype)
    dense = dense.at[safe_keys].add(jnp.where(valid[:, None], features, 0.0))
    return dense.reshape(grid.nz, grid.ny, grid.nx, channels)


def dense_mask_from_keys(keys, grid: GridSpec):
    """(V,) sorted keys -> (nz, ny, nx) bool occupancy grid."""
    target = jnp.where(keys != INVALID_KEY, keys, grid.num_cells)
    mask = jnp.zeros((grid.num_cells,), jnp.bool_).at[target].set(True, mode="drop")
    return mask.reshape(grid.nz, grid.ny, grid.nx)


def keys_from_dense_mask(mask_flat, cap: int):
    """(num_cells,) bool occupancy -> ((cap,) sorted int32 keys with
    INVALID_KEY padding, (cap,) bool valid).

    Rank-compaction: the exclusive cumsum of the mask is each occupied cell's
    output slot, ascending in cell order, so the result is sorted without a
    sort. Occupancy beyond ``cap`` drops the highest keys (the same tail the
    capped rulebook extraction drops)."""
    m = mask_flat.astype(jnp.int32)
    rank = jnp.cumsum(m) - m  # exclusive prefix count
    target = jnp.where(mask_flat, rank, cap)
    cells = jnp.arange(mask_flat.shape[0], dtype=jnp.int32)
    keys = jnp.full((cap,), INVALID_KEY, jnp.int32).at[target].set(cells, mode="drop")
    return keys, keys != INVALID_KEY


def rows_from_dense(dense_flat, keys):
    """Gather (V, C) sparse rows out of a (num_cells, C) dense grid; padding
    rows (INVALID_KEY) come back zero."""
    valid = keys != INVALID_KEY
    rows = dense_flat[jnp.where(valid, keys, 0)]
    return rows * valid[:, None].astype(rows.dtype)


def masked_batch_stats(features, valid):
    """Mean/var over valid voxels of (..., V, C) features. Returns (mean (C,), var (C,))."""
    mask = valid[..., None].astype(features.dtype)
    count = jnp.clip(jnp.sum(mask), min=1.0)
    flat_axes = tuple(range(features.ndim - 1))
    mean = jnp.sum(features * mask, axis=flat_axes) / count
    var = jnp.sum(mask * (features - mean) ** 2, axis=flat_axes) / count
    return mean, var
