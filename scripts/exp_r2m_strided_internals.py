"""Probe: internals of the strided rulebook builder (down2 @ stage-0 scale).

Pieces timed separately (same shapes as production):
  a) candidate gen + 8V sort
  b) + first-flags/cumsum/slot
  c) + segment_max extraction (the out_keys compaction)
  d) + 27-tap packed bitmap lookups
  e) full build_conv_rulebook (reference)
  f) scatter-set extraction variant (first rows scatter-set vs segment_max)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2m_strided_internals.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    rng = np.random.default_rng(0)
    grid = GridSpec(1504, 1504, 41)
    out_grid = grid.downsample((2, 2, 2), (1, 1, 1), (3, 3, 3))
    V = 120_000
    out_cap = 80_000
    pts, _ = make_lidar_frame(rng, 200_000)
    ijk = np.floor((pts[:, :3] + np.array([75.2, 75.2, 2.0])) /
                   np.array([0.1, 0.1, 0.15])).astype(np.int64)
    okm = ((ijk >= 0).all(1) & (ijk[:, 0] < grid.nx) & (ijk[:, 1] < grid.ny)
           & (ijk[:, 2] < grid.nz))
    key = np.unique(((ijk[okm, 2] * grid.ny + ijk[okm, 1]) * grid.nx
                     + ijk[okm, 0]).astype(np.int32))[:V]
    kk = np.full(V, INVALID_KEY, np.int32)
    kk[:key.shape[0]] = key
    keys = jnp.asarray(kk)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:46s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    j = jax.jit
    kernel, stride, padding = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    kx, ky, kz = kernel
    sx, sy, sz = stride
    px, py, pz = padding

    def candidates(k):
        coords = sparse.coords_from_keys(k, grid)
        valid = k != INVALID_KEY
        z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
        cand_keys = []
        for qz in range(2):
            for qy in range(2):
                for qx in range(2):
                    oz = (z + pz) // sz - qz
                    oy = (y + py) // sy - qy
                    ox = (x + px) // sx - qx
                    okz = ((z + pz - oz * sz) >= 0) & ((z + pz - oz * sz) < kz) & (oz >= 0) & (oz < out_grid.nz)
                    oky = ((y + py - oy * sy) >= 0) & ((y + py - oy * sy) < ky) & (oy >= 0) & (oy < out_grid.ny)
                    okx = ((x + px - ox * sx) >= 0) & ((x + px - ox * sx) < kx) & (ox >= 0) & (ox < out_grid.nx)
                    ok = okz & oky & okx & valid
                    kk2 = (oz * out_grid.ny + oy) * out_grid.nx + ox
                    cand_keys.append(jnp.where(ok, kk2, INVALID_KEY).astype(jnp.int32))
        return jnp.concatenate(cand_keys)

    def a_sort(k):
        return jnp.sort(candidates(k))

    def b_slots(k):
        cand = jnp.sort(candidates(k))
        first = jnp.concatenate([jnp.array([True]), cand[1:] != cand[:-1]])
        first = first & (cand != INVALID_KEY)
        slot = jnp.cumsum(first.astype(jnp.int32)) - 1
        return cand, first, slot

    def c_segmax(k):
        cand, first, slot = b_slots(k)
        slot_c = jnp.where(first & (slot < out_cap), slot, out_cap)
        out_keys = jax.ops.segment_max(
            jnp.where(first, cand, -1), slot_c, num_segments=out_cap + 1
        )[:out_cap]
        return out_keys

    def c2_scatterset(k):
        cand, first, slot = b_slots(k)
        slot_c = jnp.where(first & (slot < out_cap), slot, out_cap)
        out_keys = jnp.full((out_cap + 1,), -1, jnp.int32).at[slot_c].set(
            cand, mode="drop")[:out_cap]
        return out_keys

    def c3_bitmap(k):
        """Sort-free: scatter-set a bool map of the out grid, reduce to a
        bitmap-rank table, rank the candidates by gather, scatter keys to
        their ranks."""
        cand = candidates(k)  # (8V,)
        n_cells = out_grid.num_cells
        n_pad = -(-n_cells // 32) * 32
        ok = cand != INVALID_KEY
        tgt = jnp.where(ok, cand, n_pad)
        marks = jnp.zeros((n_pad + 1,), jnp.bool_).at[tgt].set(True, mode="drop")
        bits = marks[:n_pad].reshape(-1, 32)
        words = jnp.sum(
            jnp.where(bits, jnp.int32(1) << jnp.arange(32, dtype=jnp.int32)[None], 0),
            axis=1)
        counts = jax.lax.population_count(words)
        prefix = jnp.cumsum(counts) - counts
        pair = jnp.stack([words, prefix], axis=1)  # (n_words, 2)
        rowp = pair[jnp.where(ok, cand >> 5, 0)]
        mask = (jnp.int32(1) << (cand & 31)) - jnp.int32(1)
        rank = rowp[:, 1] + jax.lax.population_count(rowp[:, 0] & mask)
        rank = jnp.where(ok & (rank < out_cap), rank, out_cap)
        out_keys = jnp.full((out_cap + 1,), -1, jnp.int32).at[rank].set(
            cand, mode="drop")[:out_cap]
        return out_keys

    bench(j(a_sort), "a) cand gen + 8V sort", keys)
    bench(j(b_slots), "b) + first/cumsum/slot", keys)
    out_c = bench(j(c_segmax), "c) + segment_max extraction", keys)
    out_c2 = bench(j(c2_scatterset), "f) scatter-set extraction", keys)
    out_c3 = bench(j(c3_bitmap), "g) bitmap compaction (sort-free)", keys)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_c2))
    c3 = np.asarray(out_c3)
    cc = np.asarray(out_c)
    np.testing.assert_array_equal(np.where(cc >= 0, cc, -1), c3)
    print("extractions agree")

    full = j(lambda k: sparse.build_conv_rulebook_batched(
        k[None], grid, kernel, stride, padding, out_cap)[0])
    bench(full, "e) full strided build (prod)", keys)


if __name__ == "__main__":
    main()
