"""Probe: bitmap-rank LUT vs dense int32 LUT at stage-0 scale.

a) build cost: dense (92.7M-cell fill + scatter) vs bitmap (bit scatter + word cumsum)
b) 13-pos-offset packed lookups: dense vs bitmap
c) the subm inversion scatter (13, V+1) vs direct lookup of the 13 NEGATIVE
   offsets on the bitmap (is the mirror-scatter still worth it?)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2f_bitmap.py
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
    from cpd_tpu.utils.synthetic import make_lidar_frame

    rng = np.random.default_rng(0)
    grid = GridSpec(1504, 1504, 41)
    V = 150_000
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
        out = fn(*a); sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:52s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    j = jax.jit
    lut = bench(j(lambda k: sparse.build_dense_lut(k, grid)), "dense LUT build", keys)
    bm = bench(j(lambda k: sparse.build_bitmap_lut(k, grid)), "bitmap LUT build", keys)

    offsets = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
               for dx in (-1, 0, 1) if (dz, dy, dx) != (0, 0, 0)]
    pos = [o for o in offsets if (o[0] * grid.ny + o[1]) * grid.nx + o[2] > 0]
    neg = [o for o in offsets if (o[0] * grid.ny + o[1]) * grid.nx + o[2] < 0]
    coords = np.stack([kk // (grid.nx * grid.ny), (kk // grid.nx) % grid.ny,
                       kk % grid.nx], 1)

    def okmask(offs):
        nc = coords[None] + np.asarray(offs)[:, None]
        return jnp.asarray(
            (nc[..., 2] >= 0) & (nc[..., 2] < grid.nx)
            & (nc[..., 1] >= 0) & (nc[..., 1] < grid.ny)
            & (nc[..., 0] >= 0) & (nc[..., 0] < grid.nz)
            & (kk != INVALID_KEY)[None])

    ok_pos, ok_neg, ok_all = okmask(pos), okmask(neg), okmask(offsets)

    bench(j(lambda l, k, o: sparse.lookup_packed_taps(l, k, pos, grid, o)),
          "13 pos taps, dense packed", lut, keys, ok_pos)
    bench(j(lambda b, k, o: sparse.lookup_bitmap_packed_taps(b, k, pos, grid, o)),
          "13 pos taps, bitmap packed", bm, keys, ok_pos)
    bench(j(lambda b, k, o: sparse.lookup_bitmap_packed_taps(b, k, offsets, grid, o)),
          "26 taps direct, bitmap packed", bm, keys, ok_all)

    def inversion(idx_all, found_all):
        n = keys.shape[0]
        arange = jnp.arange(n, dtype=jnp.int32)
        safe_tgt = jnp.where(found_all, idx_all, n)
        packed = jnp.zeros((len(pos), n + 1), jnp.int32).at[
            jnp.arange(len(pos))[:, None], safe_tgt
        ].set(jnp.broadcast_to(arange[None] + 1, found_all.shape))[:, :n]
        return packed

    idx_all, found_all = jax.jit(
        lambda b, k, o: sparse.lookup_bitmap_packed_taps(b, k, pos, grid, o)
    )(bm, keys, ok_pos)
    bench(j(inversion), "13-tap inversion scatter", idx_all, found_all)


if __name__ == "__main__":
    main()
