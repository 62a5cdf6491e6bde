"""Probe: RoI-query window lookups -- grouped+chunked vs per-run fetches.

The 135-tap query windows issue ~45 dx-run row fetches per scale. Round 4
grouped them into chunked (R, V)-index gathers (neutral for the 9-run conv
rulebooks); this probe A/Bs the formulations at the QUERY shape (45+ runs
x 43.2k queries) where the chunked form is near the fast-path cliff.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r4_qlookup.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.ops import pool, sparse
    from cpd_tpu.ops.sparse import GridSpec, _bitmap_rank, _delta_runs

    rng = np.random.default_rng(0)
    # x_conv3 scale: 376x376x11 grid, 27k occupied of 48k cap
    grid = GridSpec(376, 376, 11)
    n_occ, cap = 27_000, 48_000
    keys = np.sort(rng.choice(grid.num_cells, n_occ, replace=False).astype(np.int64)).astype(np.int32)
    keys = np.concatenate([keys, np.full(cap - n_occ, sparse.INVALID_KEY, np.int32)])
    keys = jnp.asarray(keys)
    bm = sparse.build_bitmap_lut(keys, grid)

    q = 43_200
    qc = np.stack([
        rng.integers(4, grid.nx - 4, q),
        rng.integers(4, grid.ny - 4, q),
        rng.integers(2, grid.nz - 2, q),
    ], 1)
    base_cells = jnp.asarray(
        ((qc[:, 2] * grid.ny + qc[:, 1]) * grid.nx + qc[:, 0]).astype(np.int32))
    offsets = pool._taps_for_radius_list((4, 4, 4), (0.4, 0.4, 0.6), 1.6, 135)
    print(f"taps={len(offsets)} runs={len(_delta_runs(offsets, grid))}",
          flush=True)
    ok = jnp.ones((len(offsets), q), bool)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a)
        sync(out)
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:34s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    def grouped(bm, base_cells, ok):
        return sparse.lookup_bitmap_packed_taps(bm, base_cells, offsets, grid, ok)

    def per_run(bm, base_cells, ok):
        # pre-r4 formulation: one bm[w0] gather per dx-run
        p = len(offsets)
        n_words = bm.shape[0]
        rows = [None] * p
        hits = [None] * p
        for d0, run in _delta_runs(offsets, grid):
            span = run[-1][0] - d0 + 1
            c0 = base_cells + d0
            w0 = jnp.clip(c0 >> 5, 0, n_words - 1)
            row0 = bm[w0]
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
        found = ok & jnp.stack(hits)
        return jnp.where(found, jnp.stack(rows), 0).astype(jnp.int32), found

    ra = bench(jax.jit(grouped), "grouped+chunked (current)", bm, base_cells, ok)
    rb = bench(jax.jit(per_run), "per-run (pre-r4)", bm, base_cells, ok)
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print("outputs identical", flush=True)


if __name__ == "__main__":
    main()
