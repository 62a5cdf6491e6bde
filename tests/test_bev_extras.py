import numpy as np
import jax
import jax.numpy as jnp

from cpd_tpu.models.backbone3d import VoxelBackBone8x
from cpd_tpu.models.bev import bev_align, bev_pool
from cpd_tpu.datasets.augmentor import WorldTransformParam
from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY


def test_voxel_backbone_plain():
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize_batch
    from cpd_tpu.models.detector import keys_from_frame

    spec = VoxelizerSpec.create([-8, -8, -2, 8, 8, 4], [0.25, 0.25, 0.15], 1024)
    grid = GridSpec(spec.grid_size[0], spec.grid_size[1], spec.grid_size[2] + 1)
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.uniform(-8, 8, (1, 2000, 2)), rng.uniform(-2, 4, (1, 2000, 1)),
                          rng.uniform(0, 1, (1, 2000, 2))], -1).astype(np.float32)
    frames = voxelize_batch(jnp.asarray(pts), spec)
    keys = keys_from_frame(frames, grid)
    m = VoxelBackBone8x(grid=grid, caps=(512, 256, 128, 128))
    v = m.init(jax.random.PRNGKey(0), frames.features, keys, True)
    out, _ = m.apply(v, frames.features, keys, True, mutable=["batch_stats"])
    assert "encoded" in out and "x_conv3" in out
    assert np.isfinite(np.asarray(out["encoded"][0])).all()


def test_bev_pool():
    grid = GridSpec(4, 4, 2)
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])[None]
    # keys: cell (z=0,y=0,x=0), (z=1,y=0,x=0) -> same BEV cell 0; one at bev cell 5
    keys = jnp.asarray([[0, 16, 5]], jnp.int32)
    out = np.asarray(bev_pool(feats, keys, grid, "max"))
    assert out.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(out[0, 0, 0], [3.0, 4.0])
    np.testing.assert_allclose(out[0, 1, 1], [5.0, 6.0])
    out_mean = np.asarray(bev_pool(feats, keys, grid, "mean"))
    np.testing.assert_allclose(out_mean[0, 0, 0], [2.0, 3.0])


def test_bev_align_identity_and_fusion():
    rng = np.random.default_rng(1)
    bev = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    pcr = (-4.0, -4.0, -2.0, 4.0, 4.0, 4.0)
    out = bev_align([bev, bev], [None, WorldTransformParam()], pcr, 1.0, "mean")
    # identity alignment reproduces the interior of the map
    np.testing.assert_allclose(np.asarray(out)[0, 2:6, 2:6], np.asarray(bev)[0, 2:6, 2:6], atol=1e-5)
