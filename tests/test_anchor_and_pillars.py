import numpy as np
import jax
import jax.numpy as jnp

from cpd_tpu.models.anchor_head import AnchorHeadSingle, assign_anchor_targets, generate_anchors
from cpd_tpu.models.pillars import PillarVFE, pointpillar_scatter
from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY
from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize


def test_generate_anchors_layout():
    anch = np.asarray(generate_anchors((8, 8), [-8, -8, -2, 8, 8, 4],
                                       [(4.7, 2.1, 1.7)], (0.0, np.pi / 2)))
    assert anch.shape == (8, 8, 2, 7)
    # first anchor centered in the first cell
    np.testing.assert_allclose(anch[0, 0, 0, :2], [-7, -7], atol=1e-5)
    assert anch[0, 0, 1, 6] == np.float32(np.pi / 2)


def test_assign_anchor_targets_matches_gt():
    anch = generate_anchors((16, 16), [-8, -8, -2, 8, 8, 4], [(4.0, 2.0, 1.5)], (0.0,))
    aflat = anch.reshape(-1, 7)
    acls = jnp.ones((aflat.shape[0],), jnp.int32)
    gt = jnp.asarray([[0.5, 0.5, -0.25, 4.0, 2.0, 1.5, 0.0, 1.0]])
    tgt = assign_anchor_targets(aflat, acls, gt, jnp.asarray([True]),
                                jnp.full((aflat.shape[0],), 0.55),
                                jnp.full((aflat.shape[0],), 0.4))
    labels = np.asarray(tgt["labels"])
    assert (labels == 1).sum() >= 1  # at least the force-matched anchor
    assert (labels == 0).sum() > labels.size * 0.9


def test_anchor_head_train_loss():
    model = AnchorHeadSingle(point_cloud_range=(-8, -8, -2, 8, 8, 4))
    x = jnp.ones((2, 8, 8, 64))
    variables = model.init(jax.random.PRNGKey(0), x)
    preds, _ = model.apply(variables, x, mutable=["batch_stats"])
    gt = np.zeros((2, 4, 8), np.float32)
    gt[..., 3:6] = [4.0, 2.0, 1.5]
    gt[..., 7] = 1
    gt[:, :, 0] = np.linspace(-5, 5, 4)
    loss, tb = model.apply(variables, preds, jnp.asarray(gt),
                           jnp.ones((2, 4), bool), method=AnchorHeadSingle.get_loss)
    assert np.isfinite(float(loss))
    boxes, scores = model.apply(variables, preds, method=AnchorHeadSingle.generate_predicted_boxes)
    assert boxes.shape[-1] == 7
    assert np.all(np.isfinite(np.asarray(boxes)))


def test_pillar_vfe_and_scatter():
    spec = VoxelizerSpec.create([0, 0, -2, 8, 8, 4], [0.5, 0.5, 6.0], max_voxels=128)
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(0, 8, (500, 2)), rng.uniform(-2, 4, (500, 1)), rng.uniform(0, 1, (500, 1)),
    ], 1).astype(np.float32)
    frame = voxelize(jnp.asarray(pts), spec, with_point_voxel_id=True)
    grid = GridSpec(*spec.grid_size)
    keys = jnp.where(frame.valid,
                     (frame.coords[:, 0] * grid.ny + frame.coords[:, 1]) * grid.nx + frame.coords[:, 2],
                     INVALID_KEY).astype(jnp.int32)
    centers_xy = (frame.coords[:, 2:0:-1].astype(jnp.float32) + 0.5) * 0.5  # x, y
    model = PillarVFE(num_filters=(64,))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), frame.point_voxel_id,
                           frame.features[:, :3], centers_xy, 128)
    out, _ = model.apply(variables, jnp.asarray(pts), frame.point_voxel_id,
                         frame.features[:, :3], centers_xy, 128, True,
                         mutable=["batch_stats"])
    assert out.shape == (128, 64)
    valid = np.asarray(frame.valid)
    assert np.all(np.asarray(out)[~valid] == 0)
    bev = pointpillar_scatter(out, keys, grid)
    assert bev.shape == (grid.ny, grid.nx, 64)
    assert np.isfinite(np.asarray(bev)).all()
