import numpy as np
import jax.numpy as jnp

from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize, voxelize_batch


def _numpy_voxelize(points, spec, valid=None):
    """Oracle: dict-based voxelization + mean features."""
    pcr = np.asarray(spec.point_cloud_range)
    vs = np.asarray(spec.voxel_size)
    nx, ny, nz = spec.grid_size
    table = {}
    for i, p in enumerate(points):
        if valid is not None and not valid[i]:
            continue
        ijk = np.floor((p[:3] - pcr[:3]) / vs).astype(int)
        if not (0 <= ijk[0] < nx and 0 <= ijk[1] < ny and 0 <= ijk[2] < nz):
            continue
        key = (ijk[2] * ny + ijk[1]) * nx + ijk[0]
        table.setdefault(key, []).append(p)
    out = {}
    for key, pts in table.items():
        out[key] = (np.mean(pts, axis=0), len(pts))
    return out


def test_voxelize_matches_oracle():
    rng = np.random.default_rng(0)
    spec = VoxelizerSpec.create([-10, -10, -2, 10, 10, 4], [0.5, 0.5, 0.5], max_voxels=512)
    pts = rng.uniform(-12, 12, size=(1000, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 5, 1000)
    out = voxelize(jnp.asarray(pts), spec)
    oracle = _numpy_voxelize(pts, spec)
    got_valid = np.asarray(out.valid)
    coords = np.asarray(out.coords)
    feats = np.asarray(out.features)
    counts = np.asarray(out.num_points)
    nx, ny, _ = spec.grid_size
    got_keys = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
    assert got_valid.sum() == len(oracle)
    for i in np.where(got_valid)[0]:
        key = int(got_keys[i])
        assert key in oracle
        mean, cnt = oracle[key]
        assert counts[i] == cnt
        np.testing.assert_allclose(feats[i], mean, atol=1e-4)


def test_voxelize_respects_point_validity():
    spec = VoxelizerSpec.create([0, 0, 0, 4, 4, 4], [1, 1, 1], max_voxels=16)
    pts = np.array([[0.5, 0.5, 0.5, 1.0], [0.6, 0.6, 0.6, 3.0], [2.5, 2.5, 2.5, 7.0]], dtype=np.float32)
    valid = np.array([True, False, True])
    out = voxelize(jnp.asarray(pts), spec, jnp.asarray(valid))
    assert int(np.asarray(out.valid).sum()) == 2
    # first voxel mean uses only the first point
    feats = np.asarray(out.features)[np.asarray(out.valid)]
    assert np.any(np.isclose(feats[:, 3], 1.0))
    assert np.any(np.isclose(feats[:, 3], 7.0))


def test_voxelize_point_voxel_id_roundtrip():
    spec = VoxelizerSpec.create([0, 0, 0, 8, 8, 8], [1, 1, 1], max_voxels=512)
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 8, size=(100, 3)).astype(np.float32)
    out = voxelize(jnp.asarray(pts), spec, with_point_voxel_id=True)
    pv = np.asarray(out.point_voxel_id)
    coords = np.asarray(out.coords)
    for i in range(100):
        v = pv[i]
        assert v >= 0
        zyx = coords[v]
        ijk = np.floor(pts[i]).astype(int)
        np.testing.assert_array_equal(zyx, ijk[::-1])


def test_voxelize_overflow_capacity():
    spec = VoxelizerSpec.create([0, 0, 0, 8, 8, 8], [1, 1, 1], max_voxels=4)
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 8, size=(200, 3)).astype(np.float32)
    out = voxelize(jnp.asarray(pts), spec)
    assert int(np.asarray(out.valid).sum()) == 4  # capped, no crash


def test_voxelize_batch_shapes():
    spec = VoxelizerSpec.create([0, 0, 0, 8, 8, 8], [1, 1, 1], max_voxels=64)
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 8, size=(2, 50, 3)).astype(np.float32)
    out = voxelize_batch(jnp.asarray(pts), spec)
    assert out.features.shape == (2, 64, 3)
    assert out.coords.shape == (2, 64, 3)
    assert out.valid.shape == (2, 64)


def test_voxelize_truncated_mean_matches_spconv_oracle():
    """max_points_per_voxel=5: mean over the FIRST 5 points of each voxel in
    point order (Point2VoxelCPU3d + mean_vfe.py semantics)."""
    spec = VoxelizerSpec.create([0, 0, 0, 8, 8, 8], [2, 2, 2], max_voxels=64,
                                max_points_per_voxel=5)
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 8, size=(400, 4)).astype(np.float32)
    out = voxelize(jnp.asarray(pts), spec)
    # NumPy oracle with spconv first-5-in-order semantics
    keyof = lambda p: ((int(p[2] // 2) * 4 + int(p[1] // 2)) * 4 + int(p[0] // 2))
    groups = {}
    for p in pts:
        groups.setdefault(keyof(p), []).append(p)
    feats = np.asarray(out.features)
    coords = np.asarray(out.coords)
    counts = np.asarray(out.num_points)
    valid = np.asarray(out.valid)
    assert valid.sum() == len(groups)
    for v in np.nonzero(valid)[0]:
        z, y, x = coords[v]
        key = (int(z) * 4 + int(y)) * 4 + int(x)
        first5 = np.stack(groups[key][:5])
        assert counts[v] == len(first5)
        np.testing.assert_allclose(feats[v], first5.mean(0), rtol=1e-5, atol=1e-5)


def test_voxelize_untruncated_mean_uses_all_points():
    spec_all = VoxelizerSpec.create([0, 0, 0, 4, 4, 4], [4, 4, 4], max_voxels=4)
    rng = np.random.default_rng(8)
    pts = rng.uniform(0, 4, size=(50, 3)).astype(np.float32)
    out = voxelize(jnp.asarray(pts), spec_all)
    np.testing.assert_allclose(np.asarray(out.features)[0], pts.mean(0), rtol=1e-5)
    assert int(np.asarray(out.num_points)[0]) == 50
