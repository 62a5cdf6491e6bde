"""VectorPool aggregation vs NumPy oracles (pointnet2_modules.py:160-478)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpd_tpu.models.vector_pool import (
    VectorPoolAggregation, VectorPoolAggregationMSG, local_grid_offsets,
    three_nn_vector_pool, voxel_pool,
)


def _scene(seed=0, n=300, m=7):
    rng = np.random.default_rng(seed)
    sx = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    sv = rng.random(n) < 0.9
    sf = rng.normal(size=(n, 6)).astype(np.float32)
    cx = rng.uniform(-4, 4, (m, 3)).astype(np.float32)
    cv = np.ones(m, bool)
    cv[-1] = False
    return sx, sv, sf, cx, cv


def test_local_grid_offsets_layout():
    offs = local_grid_offsets((2, 2, 2), 1.0)
    assert offs.shape == (8, 3)
    # x-major flatten: first two entries differ only in z
    np.testing.assert_allclose(offs[0], [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(offs[1], [-0.5, -0.5, 0.5])
    np.testing.assert_allclose(offs[4], [0.5, -0.5, -0.5])


def test_three_nn_vector_pool_oracle():
    sx, sv, sf, cx, cv = _scene(1)
    offs = local_grid_offsets((3, 3, 3), 1.6)
    centers = cx[:, None, :] + offs[None, :, :]
    max_d = 3.2
    f, lx, empty = jax.jit(lambda *a: three_nn_vector_pool(*a, max_d, 0))(
        jnp.asarray(centers), jnp.asarray(cv), jnp.asarray(sx),
        jnp.asarray(sv), jnp.asarray(sf))
    f, lx, empty = map(np.asarray, (f, lx, empty))
    m, g = centers.shape[:2]
    for i in range(m):
        for j in [0, g // 2, g - 1]:
            ctr = centers[i, j]
            diff = ctr[None] - sx
            d = np.where(np.max(np.abs(diff), 1) <= max_d, np.linalg.norm(diff, axis=1), np.inf)
            d = np.where(sv, d, np.inf)
            order = np.argsort(d)[:3]
            fin = np.isfinite(d[order])
            if not cv[i] or not fin.any():
                assert empty[i, j]
                np.testing.assert_allclose(f[i, j], 0.0)
                continue
            w = np.where(fin, 1.0 / (d[order] + 1e-8), 0.0)
            w = w / max(w.sum(), 1e-8)
            want = (w[:, None] * sf[order]).sum(0)
            np.testing.assert_allclose(f[i, j], want, rtol=2e-4, atol=2e-4)
            want_lx = np.where(fin[:, None], ctr[None] - sx[order], 0.0).ravel()
            np.testing.assert_allclose(lx[i, j], want_lx, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["avg", "choice"])
def test_voxel_pool_oracle(mode):
    sx, sv, sf, cx, cv = _scene(2)
    nvox, r = (2, 2, 2), 1.5
    f, lx, cnt = jax.jit(lambda *a: voxel_pool(*a, nvox, r, mode))(
        jnp.asarray(cx), jnp.asarray(cv), jnp.asarray(sx), jnp.asarray(sv),
        jnp.asarray(sf))
    f, lx, cnt = map(np.asarray, (f, lx, cnt))
    nx, ny, nz = nvox
    for i in range(cx.shape[0]):
        loc = sx - cx[i]
        ok = (np.max(np.abs(loc), 1) < r) & sv & cv[i]
        cell = np.clip(np.floor((loc + r) / (2 * r) * np.array(nvox)), 0,
                       np.array(nvox) - 1)
        cid = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
        for gcell in range(nx * ny * nz):
            members = np.where(ok & (cid == gcell))[0]
            assert cnt[i, gcell] == len(members)
            if len(members) == 0:
                np.testing.assert_allclose(f[i, gcell], 0.0)
            elif mode == "avg":
                np.testing.assert_allclose(f[i, gcell], sf[members].mean(0),
                                           rtol=1e-4, atol=1e-4)
                np.testing.assert_allclose(lx[i, gcell], loc[members].mean(0),
                                           rtol=1e-4, atol=1e-4)
            else:  # first in scan order
                np.testing.assert_allclose(f[i, gcell], sf[members[0]],
                                           rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("agg", ["local_interpolation", "voxel_avg_pool",
                                 "voxel_random_choice"])
def test_vector_pool_module_shapes(agg):
    sx, sv, sf, cx, cv = _scene(3)
    mod = VectorPoolAggregation(
        input_channels=6, num_local_voxel=(2, 2, 2), num_reduced_channels=3,
        local_aggregation_type=agg, post_mlps=(16, 8),
        max_neighbor_distance=1.6, num_channels_of_local_aggregation=4)
    args = (jnp.asarray(sx)[None], jnp.asarray(sv)[None], jnp.asarray(sf)[None],
            jnp.asarray(cx)[None], jnp.asarray(cv)[None])
    variables = mod.init(jax.random.PRNGKey(0), *args, True)
    out, _ = mod.apply(variables, *args, True, mutable=["batch_stats"])
    assert out.shape == (1, cx.shape[0], 8)
    assert np.isfinite(np.asarray(out)).all()
    assert np.allclose(np.asarray(out)[0, ~cv], 0.0)
    out_eval = mod.apply(variables, *args, False)
    assert out_eval.shape == out.shape


def test_vector_pool_msg():
    sx, sv, sf, cx, cv = _scene(4)
    mod = VectorPoolAggregationMSG(
        input_channels=6, num_reduced_channels=3,
        groups=({"num_local_voxel": (2, 2, 2), "post_mlps": (16,),
                 "max_neighbor_distance": 0.8},
                {"num_local_voxel": (3, 3, 3), "post_mlps": (16,),
                 "max_neighbor_distance": 1.6}),
        num_channels_of_local_aggregation=4, msg_post_mlps=(24, 12))
    args = (jnp.asarray(sx)[None], jnp.asarray(sv)[None], jnp.asarray(sf)[None],
            jnp.asarray(cx)[None], jnp.asarray(cv)[None])
    variables = mod.init(jax.random.PRNGKey(0), *args, True)
    out, _ = mod.apply(variables, *args, True, mutable=["batch_stats"])
    assert out.shape == (1, cx.shape[0], 12)
    assert np.isfinite(np.asarray(out)).all()
