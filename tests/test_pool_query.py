"""voxel_query / voxel_query_fast vs brute-force neighbor oracle."""
import numpy as np
import jax.numpy as jnp

from cpd_tpu.ops import pool
from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY


def _setup(seed=0, n_vox=300, n_q=50):
    rng = np.random.default_rng(seed)
    grid = GridSpec(20, 20, 10)
    cells = grid.num_cells
    keys = np.sort(rng.choice(cells, n_vox, replace=False)).astype(np.int32)
    cap = n_vox + 20
    keys_pad = np.concatenate([keys, np.full(20, INVALID_KEY, np.int32)])
    vs = (0.5, 0.5, 0.5)
    pcr = (0.0, 0.0, 0.0, 10.0, 10.0, 5.0)
    # voxel centers
    x = keys % grid.nx
    y = (keys // grid.nx) % grid.ny
    z = keys // (grid.nx * grid.ny)
    centers = np.stack([(x + 0.5) * 0.5, (y + 0.5) * 0.5, (z + 0.5) * 0.5], 1)
    queries = rng.uniform(0.5, 9.5, (n_q, 3)).astype(np.float32)
    queries[:, 2] = rng.uniform(0.5, 4.5, n_q)
    return grid, keys, keys_pad, centers, queries, vs, pcr


def _oracle(queries, centers, radius, nsample):
    out = []
    for q in queries:
        d = np.linalg.norm(centers - q, axis=1)
        idx = np.where(d <= radius)[0]
        idx = idx[np.argsort(d[idx])][:nsample]
        out.append(set(idx.tolist()))
    return out


def test_voxel_query_fast_matches_oracle():
    """Exact in the supported regime: radius <= 2 voxel units, where the
    33 distance-closest taps cover the whole ball (all offsets with
    d^2 <= 4 number exactly 33 -- the production configs all satisfy this:
    POOL_RADIUS <= 2x the scale voxel size)."""
    grid, keys, keys_pad, centers, queries, vs, pcr = _setup()
    radius, nsample = 1.0, 8  # 2.0 voxel units
    idx, valid, cent = pool.voxel_query_fast(
        jnp.asarray(queries), jnp.asarray(keys_pad), grid, vs, pcr,
        downsample=1, query_range=(2, 2, 2), radius=radius, nsample=nsample,
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    want = _oracle(queries, centers, radius, nsample)
    for i in range(len(queries)):
        got = set(idx[i][valid[i]].tolist())
        assert got == want[i], (i, got, want[i])


def test_voxel_query_slow_matches_oracle():
    grid, keys, keys_pad, centers, queries, vs, pcr = _setup(1)
    radius, nsample = 1.0, 8
    idx, valid, cent = pool.voxel_query(
        jnp.asarray(queries), jnp.asarray(keys_pad), grid, vs, pcr,
        downsample=1, query_range=(2, 2, 2), radius=radius, nsample=nsample,
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    want = _oracle(queries, centers, radius, nsample)
    for i in range(len(queries)):
        got = set(idx[i][valid[i]].tolist())
        assert got == want[i], i


def test_voxel_query_multi_matches_single():
    import jax
    grid, keys, keys_pad, centers, queries, vs, pcr = _setup(2)
    multi = pool.voxel_query_multi(
        jnp.asarray(queries), jnp.asarray(keys_pad), grid, vs, pcr,
        downsample=1, query_range=(2, 2, 2), radii=(0.5, 1.0), nsample=8,
        select="nearest",
    )
    for radius, (idx, valid, cent) in zip((0.5, 1.0), multi):
        si, sv, sc = pool.voxel_query_fast(
            jnp.asarray(queries), jnp.asarray(keys_pad), grid, vs, pcr,
            downsample=1, query_range=(2, 2, 2), radius=radius, nsample=8,
        )
        got = [set(np.asarray(idx)[i][np.asarray(valid)[i]].tolist()) for i in range(len(queries))]
        want = [set(np.asarray(si)[i][np.asarray(sv)[i]].tolist()) for i in range(len(queries))]
        assert got == want, radius


def _first_k_oracle(queries, keys, centers, grid, vs_eff, query_range, radius,
                    nsample):
    """first-nsample-found in the production tap order (reference
    voxel_query_gpu.cu semantics, distance-sorted scan order)."""
    taps = pool._taps_for_radius_list(query_range, vs_eff, radius)
    key_to_row = {int(k): i for i, k in enumerate(keys)}
    out = []
    for q in queries:
        qc = np.floor(q / np.asarray(vs_eff)).astype(int)  # pcr = 0 in _setup
        rows = []
        for dz, dy, dx in taps:
            c = qc + np.array([dx, dy, dz])
            if not (0 <= c[0] < grid.nx and 0 <= c[1] < grid.ny and 0 <= c[2] < grid.nz):
                continue
            key = (c[2] * grid.ny + c[1]) * grid.nx + c[0]
            row = key_to_row.get(int(key))
            if row is None:
                continue
            if np.linalg.norm(centers[row] - q) <= radius:
                rows.append(row)
            if len(rows) == nsample:
                break
        out.append(rows)
    return out


def test_voxel_query_first_matches_scan_oracle():
    """select='first' (production default) == the reference scan semantics."""
    grid, keys, keys_pad, centers, queries, vs, pcr = _setup(3)
    radius, nsample = 1.0, 4  # small nsample so first-k != all-found
    idx, valid, cent = pool.voxel_query_fast(
        jnp.asarray(queries), jnp.asarray(keys_pad), grid, vs, pcr,
        downsample=1, query_range=(2, 2, 2), radius=radius, nsample=nsample,
        select="first",
    )
    idx, valid = np.asarray(idx), np.asarray(valid)
    cent = np.asarray(cent)
    want = _first_k_oracle(queries, keys, centers, grid, vs, (2, 2, 2),
                           radius, nsample)
    for i in range(len(queries)):
        got = idx[i][valid[i]].tolist()
        assert got == want[i], (i, got, want[i])
        # centers of the selected voxels must match the true voxel centers
        np.testing.assert_allclose(cent[i][valid[i]], centers[got], atol=1e-5)


def test_voxel_query_multi_lut_matches_join(monkeypatch):
    """The dense-LUT query path and the rank-join path must agree exactly."""
    import numpy as np
    import jax.numpy as jnp
    from cpd_tpu.ops import pool
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY

    rng = np.random.default_rng(5)
    grid = GridSpec(40, 40, 11)
    n_act, cap = 300, 400
    keys = np.sort(rng.choice(grid.num_cells, n_act, replace=False).astype(np.int32))
    keys = jnp.asarray(np.concatenate([keys, np.full(cap - n_act, INVALID_KEY, np.int32)]))
    q = jnp.asarray(rng.uniform(0, 15, (200, 3)).astype(np.float32))
    kwargs = dict(grid=grid, voxel_size=(0.4, 0.4, 0.6), point_cloud_range=(0, 0, 0, 16, 16, 6.6),
                  downsample=1, query_range=(3, 3, 3), radii=(0.8, 1.6), nsample=8)

    # use_lut is an explicit (static) parameter -- no module state involved
    out_lut = pool.voxel_query_multi(q, keys, max_taps=200, use_lut=True, **kwargs)
    out_join = pool.voxel_query_multi(q, keys, max_taps=201, use_lut=False, **kwargs)
    for (il, vl, cl), (ij, vj, cj) in zip(out_lut, out_join):
        np.testing.assert_array_equal(np.asarray(vl), np.asarray(vj))
        # indices may tie-break differently only where invalid
        np.testing.assert_array_equal(np.asarray(il)[np.asarray(vl)],
                                      np.asarray(ij)[np.asarray(vj)])
        np.testing.assert_allclose(np.asarray(cl)[np.asarray(vl)],
                                   np.asarray(cj)[np.asarray(vj)], atol=1e-5)


def test_unrolled_vmap_matches_vmap():
    """pool.unrolled_vmap is a pure lowering choice: per-sample unrolled
    voxel queries must equal the vmapped batched ones leaf-for-leaf."""
    import jax

    rng = np.random.default_rng(3)
    grid = GridSpec(40, 40, 8)
    b, cap, n_occ, q = 3, 256, 200, 64
    keys = []
    for _ in range(b):
        k = np.sort(rng.choice(grid.num_cells, n_occ, replace=False))
        keys.append(np.concatenate(
            [k, np.full(cap - n_occ, INVALID_KEY, np.int32)]))
    keys = jnp.asarray(np.stack(keys).astype(np.int32))
    qxyz = jnp.asarray(rng.uniform(0.5, 3.5, (b, q, 3)).astype(np.float32))
    vs, pcr = (0.1, 0.1, 0.15), (0.0, 0.0, 0.0, 4.0, 4.0, 1.2)

    def q_multi(qx, k):
        return pool.voxel_query_multi(
            qx, k, grid, vs, pcr, 1, (2, 2, 2), (0.3, 0.6), 8, use_lut=False)

    ref = jax.vmap(q_multi)(qxyz, keys)
    got = pool.unrolled_vmap(q_multi, (qxyz, keys), min_rows=1)
    for leaf_r, leaf_g in zip(jax.tree_util.tree_leaves(ref),
                              jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(leaf_r), np.asarray(leaf_g))
