"""X_TRAIN/X_TEST per-stage clone protocol + BEV de-augmentation
(X_transform.py:9-255, height_compression.py:81-167)."""
import numpy as np
import jax
import jax.numpy as jnp

from cpd_tpu.datasets.augmentor import XTransform
from cpd_tpu.models.bev import bev_align_params


def _scene(seed=0, n=500):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-40, 40, (n, 2)),
                          rng.uniform(-1, 3, (n, 1)),
                          rng.uniform(0, 1, (n, 2))], axis=1).astype(np.float32)
    boxes = np.array([[10.0, 5.0, 0.5, 4.5, 2.0, 1.6, 0.3],
                      [-20.0, 12.0, 0.2, 4.2, 1.9, 1.5, -1.1]], np.float32)
    return pts, boxes


def test_xtransform_stages_and_roundtrip():
    pts, boxes = _scene()
    xt = XTransform(stages=3)
    data = xt.input_transform({"points": pts.copy(), "gt_boxes": boxes.copy()},
                              np.random.default_rng(7))
    assert data["transform_param"].shape == (3, 3)
    assert "points_stage1" in data and "points_stage2" in data
    assert "gt_boxes_stage1" in data
    # forward-then-backward restores the source exactly, per stage
    for i in range(3):
        row = data["transform_param"][i]
        fwd_p, fwd_b = xt.apply_row(pts, boxes, row)
        back_p, back_b = xt.apply_row(fwd_p, fwd_b, row, backward=True)
        np.testing.assert_allclose(back_p, pts, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(back_b[:, :6], boxes[:, :6], rtol=1e-5, atol=1e-5)
        # feature columns untouched
        np.testing.assert_allclose(fwd_p[:, 3:], pts[:, 3:])
    # backward_row == apply_row(backward=True) on boxes
    pred = data["gt_boxes_stage2"]
    restored = xt.backward_row(pred, data["transform_param"][2])
    np.testing.assert_allclose(restored[:, :6], boxes[:, :6], rtol=1e-5, atol=1e-5)


def test_xtransform_fixed_shares_params():
    xt = XTransform(stages=4, fixed=True)
    p = xt.get_params(np.random.default_rng(0))
    assert np.all(p == p[0])


def test_bev_align_params_recovers_rotated_map():
    """A pattern voxelized under a stage transform must, after alignment,
    match the stage-0 map (up to bilinear blur at edges)."""
    rng = np.random.default_rng(3)
    pcr = (-40.0, -40.0, -2.0, 40.0, 40.0, 4.0)
    h = w = 80
    stride = 1.0
    xt = XTransform(stages=2)
    params = np.array([[0.0, 0.0, 1.0],             # stage 0: identity
                       [0.6, 1.0, 1.02]], np.float32)  # rot+flip+scale

    # world-space blobs -> rasterize under each stage's transform
    centers = rng.uniform(-25, 25, (30, 2)).astype(np.float32)

    def raster(row):
        pts = np.concatenate([centers, np.zeros((30, 1), np.float32)], axis=1)
        t, _ = xt.apply_row(pts, None, row)
        img = np.zeros((h, w, 1), np.float32)
        ys = jnp.asarray(pcr[1]) + (np.arange(h) + 0.5) * stride
        xs = jnp.asarray(pcr[0]) + (np.arange(w) + 0.5) * stride
        gy, gx = np.meshgrid(np.asarray(ys), np.asarray(xs), indexing="ij")
        for cx, cy in t[:, :2]:
            img[..., 0] += np.exp(-((gx - cx) ** 2 + (gy - cy) ** 2) / (2 * 2.0 ** 2))
        return img

    m0 = raster(params[0])
    m1 = raster(params[1])
    fused = bev_align_params(
        [jnp.asarray(m0)[None], jnp.asarray(m1)[None]],
        jnp.asarray(params)[None], pcr, stride, fusion="mean")
    fused = np.asarray(fused)[0, ..., 0]
    # interior agreement: mean fusion of two aligned copies ~= stage-0 map
    inner = (slice(8, -8), slice(8, -8))
    err = np.abs(fused[inner] - m0[inner][..., 0]).mean()
    base = np.abs(m1[inner][..., 0] - m0[inner][..., 0]).mean()
    assert err < 0.25 * base + 1e-3, (err, base)
    # 'first' fusion returns stage 0 exactly
    first = bev_align_params(
        [jnp.asarray(m0)[None], jnp.asarray(m1)[None]],
        jnp.asarray(params)[None], pcr, stride, fusion="first")
    np.testing.assert_allclose(np.asarray(first)[0], m0, atol=1e-6)


def test_detector_align_stages_smoke():
    """Tiny VoxelRCNN with align_stages=2 runs fwd (train+eval) finitely."""
    from cpd_tpu.models.detector import VoxelRCNN

    rng = np.random.default_rng(0)
    xt = XTransform(stages=2)
    n = 2000
    pts = np.concatenate([rng.uniform(-7, 7, (n, 2)),
                          rng.uniform(-1, 2.5, (n, 1)),
                          rng.uniform(0, 1, (n, 2))], axis=1).astype(np.float32)
    data = xt.input_transform({"points": pts}, rng)
    batch = {
        "points": jnp.asarray(data["points"])[None],
        "points_valid": jnp.ones((1, n), bool),
        "points_stage1": jnp.asarray(data["points_stage1"])[None],
        "points_stage1_valid": jnp.ones((1, n), bool),
        "transform_param": jnp.asarray(data["transform_param"])[None],
    }
    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 4.0),
        voxel_size=(0.25, 0.25, 0.15), max_voxels=2048,
        backbone_caps=(1024, 512, 256, 256), mm=False, remat=False,
        with_roi_head=False, align_stages=2, align_method="max",
        num_rois=32, num_rois_test=32, roi_per_image=16,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, False)
    out = model.apply(variables, batch, False)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves
               if np.asarray(l).dtype.kind == "f")
    # stage clones must go through the SAME backbone parameters (no extra tree)
    assert set(variables["params"].keys()) >= {"backbone", "bev_backbone"}
    assert "backbone_1" not in variables["params"]

    # the packed (S*B one-pass) and sequential (S passes) stage routings are
    # numerically identical: packing only folds the batch axis
    model_seq = model.clone(pack_align_stages=False)
    out_seq = model_seq.apply(variables, batch, False)
    for k in ("batch_box_preds", "batch_cls_preds"):
        if k in out and k in out_seq:
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(out_seq[k]),
                                       rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["rois"]), np.asarray(out_seq["rois"]),
                               rtol=2e-2, atol=2e-3)
