"""Probe 13 (round-2 intel): decompose voxel_query_multi's ~100 ms.

Times, at eval scale (Q=43200, x_conv3 grid, 2 radii):
  (a) LUT build + per-tap lookups only
  (b) + centers/distance math
  (c) + top_k and selections (the full query)
"""
import time
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from cpd_tpu.ops import pool, sparse
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY, SENTINEL

    grid = GridSpec(376, 376, 11)
    rng = np.random.default_rng(0)
    cap, nact, Q = 20000, 18000, 43200
    k = np.sort(rng.choice(grid.num_cells, nact, replace=False).astype(np.int32))
    keys = jnp.asarray(np.concatenate([k, np.full(cap - nact, INVALID_KEY, np.int32)]))
    qxyz = jnp.asarray(np.stack([
        rng.uniform(-70, 70, Q), rng.uniform(-70, 70, Q), rng.uniform(-1, 2, Q)
    ], -1).astype(np.float32))
    vs, pcr = (0.4, 0.4, 0.6), (-75.2, -75.2, -2.0)
    offs = pool._taps_for_radius((4, 4, 4), vs, 1.6, 135)
    W = offs.shape[0]
    deltas = (offs[:, 0] * grid.ny + offs[:, 1]) * grid.nx + offs[:, 2]

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name):
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        sync(out)
        print(f"{name:40s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms  (W={W})", flush=True)

    def common():
        qc = jnp.floor((qxyz - jnp.asarray(pcr)) / jnp.asarray(vs)).astype(jnp.int32)
        ok = ((qc[:, 0] >= 0) & (qc[:, 0] < grid.nx) & (qc[:, 1] >= 0)
              & (qc[:, 1] < grid.ny) & (qc[:, 2] >= 0) & (qc[:, 2] < grid.nz))
        qk = jnp.where(ok, (qc[:, 2] * grid.ny + qc[:, 1]) * grid.nx + qc[:, 0], SENTINEL)
        return qc, qk

    @jax.jit
    def lookups_only():
        qc, qk = common()
        lut = sparse.build_dense_lut(keys, grid)
        rows = qk[None, :] + deltas[:, None]
        return sparse.lookup_dense_rows(lut, jnp.where(qk[None, :] >= SENTINEL, 0, rows),
                                        qk[None, :] < SENTINEL)

    @jax.jit
    def with_centers():
        idx_all, found = lookups_only()
        qc, qk = common()
        nx_c = qc[None, :, 0] + offs[:, None, 2]
        ny_c = qc[None, :, 1] + offs[:, None, 1]
        nz_c = qc[None, :, 2] + offs[:, None, 0]
        centers = jnp.stack([
            (nx_c.astype(jnp.float32) + 0.5) * vs[0] + pcr[0],
            (ny_c.astype(jnp.float32) + 0.5) * vs[1] + pcr[1],
            (nz_c.astype(jnp.float32) + 0.5) * vs[2] + pcr[2]], -1)
        return jnp.linalg.norm(centers - qxyz[None], axis=-1)

    @jax.jit
    def full():
        return pool.voxel_query_multi(qxyz, keys, grid, vs,
                                      (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                      1, (4, 4, 4), (0.8, 1.6), 16)

    bench(lookups_only, "(a) LUT build + per-tap lookups")
    bench(with_centers, "(b) + centers/dist")
    bench(full, "(c) full voxel_query_multi")


if __name__ == "__main__":
    main()
