"""ProposalTargetLayer CLS_SCORE_TYPE variants + HARD_SAMPLE
(proposal_target_layer.py:64-163 parity)."""
import numpy as np
import jax
import jax.numpy as jnp

from cpd_tpu.models.roi_head import sample_rois_for_rcnn


def _scene(n_roi=64, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.zeros((8, 8), np.float32)
    gt[:, :2] = rng.uniform(-20, 20, (8, 2))
    gt[:, 3:6] = [4.5, 1.9, 1.6]
    gt[:, 6] = rng.uniform(-np.pi, np.pi, 8)
    gt[:, 7] = rng.integers(1, 4, 8)
    # rois: jittered copies of gts + random negatives
    rois = np.concatenate([
        gt[:, :7] + rng.normal(0, 0.3, (8, 7)).astype(np.float32),
        np.concatenate([rng.uniform(-20, 20, (n_roi - 8, 2)),
                        rng.uniform(-1, 1, (n_roi - 8, 1)),
                        np.tile([[4.5, 1.9, 1.6]], (n_roi - 8, 1)),
                        rng.uniform(-np.pi, np.pi, (n_roi - 8, 1))], 1).astype(np.float32),
    ])
    labels = np.concatenate([gt[:, 7], rng.integers(1, 4, n_roi - 8)]).astype(np.int32)
    return (jnp.asarray(rois), jnp.asarray(np.linspace(1, 0, n_roi, dtype=np.float32)),
            jnp.asarray(labels), jnp.ones(n_roi, bool), jnp.asarray(gt),
            jnp.ones(8, bool), jnp.ones(8, np.float32))


def _sample(**kw):
    args = _scene()
    return sample_rois_for_rcnn(jax.random.PRNGKey(0), *args,
                                roi_per_image=32, **kw)


def test_cls_type_hard_labels_with_ignore():
    t = _sample(cls_score_type="cls", cls_fg_thresh=0.6, cls_bg_thresh=0.2)
    lab = np.asarray(t["cls_labels"])[np.asarray(t["valid"])]
    assert set(np.unique(lab)).issubset({-1.0, 0.0, 1.0})


def test_roi_ioud_scales_by_heading():
    t_iou = _sample(cls_score_type="roi_iou")
    t_ioud = _sample(cls_score_type="roi_ioud", direction_min=0.0,
                     direction_max=1.0)
    # identical sampling RNG -> same rois; ioud labels <= iou labels
    np.testing.assert_array_equal(np.asarray(t_iou["rois"]), np.asarray(t_ioud["rois"]))
    li, ld = np.asarray(t_iou["cls_labels"]), np.asarray(t_ioud["cls_labels"])
    assert (ld <= li + 1e-6).all()
    assert (ld < li - 1e-4).any()  # some heading mismatch must bite


def test_roi_iou_x_per_class_thresholds():
    t = _sample(cls_score_type="roi_iou_x",
                cls_fg_thresh=(0.9, 0.2, 0.2), cls_bg_thresh=(0.85, 0.1, 0.1))
    lab = np.asarray(t["cls_labels"])
    iou = np.asarray(t["roi_ious"])
    cls = np.asarray(t["gt_of_rois"])[:, 7].astype(int)
    v = np.asarray(t["valid"])
    # class-1 rois with iou below its high bg threshold -> 0
    m = v & (cls == 1) & (iou < 0.85)
    assert (lab[m] == 0).all()
    # class-2/3 rois above their low fg threshold -> 1
    m2 = v & (cls >= 2) & (iou > 0.2)
    if m2.any():
        assert (lab[m2] == 1).all()


def test_hard_sampling_grows_reg_pool():
    t_off = _sample(reg_fg_thresh=0.55, enable_hard_sampling=False)
    t_on = _sample(reg_fg_thresh=0.55, enable_hard_sampling=True,
                   hard_sampling_thresh=0.05, hard_sampling_ratio=1.0)
    assert (np.asarray(t_on["reg_valid_mask"]).sum()
            > np.asarray(t_off["reg_valid_mask"]).sum())
