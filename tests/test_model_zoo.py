"""Optional model-zoo components: temporal fusion, PartWraper, PFE, pool ops."""
import numpy as np
import jax
import jax.numpy as jnp

from cpd_tpu.models.temporal import ConvGRU, ConvLSTM, TemporalConcatenation
from cpd_tpu.models.part_wraper import PartWraper, bilinear_sample_bev, box_part_points
from cpd_tpu.models.pfe import VoxelSetAbstraction
from cpd_tpu.ops import pool
from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY


def test_temporal_models():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 8, 8, 16)).astype(np.float32))
    for cls in (TemporalConcatenation, ConvGRU, ConvLSTM):
        m = cls()
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape[:3] == (2, 8, 8)
        assert np.isfinite(np.asarray(out)).all()


def test_bilinear_sample_exact_at_centers():
    fm = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    pcr = (0.0, 0.0, -2.0, 4.0, 4.0, 4.0)
    # cell centers at stride 1: (0.5, 0.5) -> fm[0, 0]
    xy = jnp.asarray([[0.5, 0.5], [1.5, 0.5], [0.5, 1.5]])
    out = np.asarray(bilinear_sample_bev(fm, xy, pcr, 1.0))[:, 0]
    np.testing.assert_allclose(out, [0, 1, 4], atol=1e-5)


def test_part_wraper_loss_and_scores():
    model = PartWraper(point_cloud_range=(-8, -8, -2, 8, 8, 4), voxel_size=(1.0, 1.0, 1.0),
                       feature_map_stride=1)
    bev = jnp.ones((2, 16, 16, 8))
    boxes = jnp.asarray(np.tile([[0.0, 0, 0, 4, 2, 1.5, 0.3]], (2, 5, 1)).astype(np.float32))
    valid = jnp.ones((2, 5), bool)
    variables = model.init(jax.random.PRNGKey(0), bev, boxes, valid)
    conf, cmap = model.apply(variables, bev, boxes, valid)
    assert conf.shape == (2, 5)
    gt = jnp.concatenate([boxes, jnp.ones((2, 5, 1))], -1)
    loss = model.apply(variables, conf, boxes, valid, gt, valid,
                       method=PartWraper.get_loss)
    assert np.isfinite(float(loss))


def test_fps_spreads_points():
    pts = np.zeros((100, 3), np.float32)
    pts[:50, 0] = np.linspace(0, 1, 50)       # tight cluster
    pts[50:, 0] = np.linspace(100, 101, 50)   # far cluster
    sel = np.asarray(pool.farthest_point_sample(jnp.asarray(pts), jnp.ones(100, bool), 10))
    # both clusters must be represented
    assert (pts[sel, 0] < 50).any() and (pts[sel, 0] > 50).any()


def test_three_nn_interpolate():
    support = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    feats = jnp.asarray([[1.0], [2.0], [3.0]])
    q = jnp.asarray([[0.0, 0, 0]])
    out = np.asarray(pool.three_nn_interpolate(q, support, jnp.ones(3, bool), feats))
    assert abs(out[0, 0] - 1.0) < 0.1  # dominated by the coincident support point


def test_voxel_set_abstraction():
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize
    from cpd_tpu.models.detector import keys_from_frame

    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.uniform(-8, 8, (2, 1000, 2)),
                          rng.uniform(-2, 4, (2, 1000, 1)),
                          rng.uniform(0, 1, (2, 1000, 2))], -1).astype(np.float32)
    spec = VoxelizerSpec.create([-8, -8, -2, 8, 8, 4], [0.25, 0.25, 0.15], 2048)
    grid = GridSpec(spec.grid_size[0], spec.grid_size[1], spec.grid_size[2] + 1)
    frames = jax.vmap(lambda p: voxelize(p, spec))(jnp.asarray(pts))
    keys = keys_from_frame(frames, grid)
    backbone_out = {
        "x_conv3": (jnp.ones((2, 2048, 64)), keys, grid),
        "x_conv4": (jnp.ones((2, 2048, 128)), keys, grid),
    }
    model = VoxelSetAbstraction(num_keypoints=64, voxel_size=(0.25, 0.25, 0.15),
                                point_cloud_range=(-8, -8, -2, 8, 8, 4),
                                scale_specs=(("x_conv3", 1, (2, 2, 2), 1.2),
                                             ("x_conv4", 1, (2, 2, 2), 2.4)),
                                use_bev=False)
    valid = jnp.ones((2, 1000), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), valid, backbone_out)
    kp, feats, kp_valid = model.apply(variables, jnp.asarray(pts), valid, backbone_out)
    assert kp.shape == (2, 64, 3)
    assert feats.shape == (2, 64, 64)
    assert np.isfinite(np.asarray(feats)).all()
