import numpy as np
import jax.numpy as jnp

from cpd_tpu.ops import iou3d, nms
from . import oracles


def test_overlap_bev_identical_boxes():
    boxes = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.7]], dtype=jnp.float32)
    o = np.asarray(iou3d.boxes_overlap_bev(boxes, boxes))
    np.testing.assert_allclose(o[0, 0], 8.0, rtol=1e-4)


def test_overlap_bev_disjoint():
    a = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.3]], dtype=jnp.float32)
    b = jnp.asarray([[100, 100, 0, 4, 2, 1.5, -0.8]], dtype=jnp.float32)
    o = np.asarray(iou3d.boxes_overlap_bev(a, b))
    assert o[0, 0] == 0.0


def test_overlap_bev_vs_oracle_random():
    rng = np.random.default_rng(7)
    boxes_a = oracles.random_boxes(24, rng, span=8.0).astype(np.float32)
    boxes_b = oracles.random_boxes(24, rng, span=8.0).astype(np.float32)
    got = np.asarray(iou3d.boxes_overlap_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(24):
        for j in range(24):
            want = oracles.overlap_bev(boxes_a[i], boxes_b[j])
            assert abs(got[i, j] - want) < 5e-3, (i, j, got[i, j], want)


def test_iou3d_vs_oracle():
    rng = np.random.default_rng(8)
    boxes_a = oracles.random_boxes(16, rng, span=6.0).astype(np.float32)
    boxes_b = oracles.random_boxes(16, rng, span=6.0).astype(np.float32)
    got = np.asarray(iou3d.boxes_iou3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(16):
        for j in range(16):
            want = oracles.iou_3d(boxes_a[i], boxes_b[j])
            assert abs(got[i, j] - want) < 5e-3


def test_axis_aligned_overlap_exact():
    # axis-aligned half-overlap case has an exact closed form
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
    b = jnp.asarray([[1, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
    o = np.asarray(iou3d.boxes_overlap_bev(a, b))
    np.testing.assert_allclose(o[0, 0], 2.0, atol=1e-4)
    iou = np.asarray(iou3d.boxes_iou_bev(a, b))
    np.testing.assert_allclose(iou[0, 0], 2.0 / 6.0, atol=1e-4)


def test_rotated_45_overlap():
    # square rotated 45 deg inside same square: intersection is a regular octagon
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
    b = jnp.asarray([[0, 0, 0, 2, 2, 2, np.pi / 4]], dtype=jnp.float32)
    o = np.asarray(iou3d.boxes_overlap_bev(a, b))
    want = oracles.overlap_bev(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(o[0, 0], want, atol=1e-3)


def test_nms_matches_oracle():
    rng = np.random.default_rng(9)
    boxes = oracles.random_boxes(64, rng, span=12.0).astype(np.float32)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    idx, mask = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                            pre_max_size=64, post_max_size=64)
    got = sorted(np.asarray(idx)[np.asarray(mask)].tolist())
    want = sorted(oracles.greedy_nms(boxes, scores, 0.1))
    assert got == want


def test_nms_respects_valid_mask():
    boxes = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0], [0.1, 0, 0, 2, 2, 2, 0.0]], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.asarray([False, True])
    idx, mask = nms.nms_bev(boxes, scores, 0.5, pre_max_size=2, post_max_size=2, valid=valid)
    kept = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(kept, [1])


def test_class_agnostic_nms_score_thresh():
    rng = np.random.default_rng(10)
    boxes = oracles.random_boxes(32, rng, span=50.0).astype(np.float32)
    scores = np.linspace(0, 1, 32).astype(np.float32)
    cfg = {"NMS_THRESH": 0.7, "NMS_PRE_MAXSIZE": 32, "NMS_POST_MAXSIZE": 16}
    idx, mask, sel_scores = nms.class_agnostic_nms(
        jnp.asarray(scores), jnp.asarray(boxes), cfg, score_thresh=0.5
    )
    kept_scores = np.asarray(sel_scores)[np.asarray(mask)]
    assert (kept_scores >= 0.5).all()


def test_wbf_fuses_cluster():
    boxes = jnp.asarray(
        [
            [0.0, 0, 0, 4, 2, 2, 0.0],
            [0.2, 0, 0, 4, 2, 2, 0.05],
            [50.0, 0, 0, 4, 2, 2, 0.0],
        ],
        dtype=jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.7, 0.5])
    labels = jnp.asarray([1, 1, 1])
    fused, fscores, flabels, mask = nms.weighted_box_fusion(boxes, scores, labels, iou_thresh=0.5)
    m = np.asarray(mask)
    f = np.asarray(fused)[m]
    assert m.sum() == 2
    # the cluster's fused x should be the score-weighted mean of 0.0 and 0.2
    want_x = (0.9 * 0.0 + 0.7 * 0.2) / 1.6
    fused_near = f[np.abs(f[:, 0]) < 1.0]
    np.testing.assert_allclose(fused_near[0, 0], want_x, atol=1e-4)


def test_fast_nms_close_to_greedy():
    rng = np.random.default_rng(11)
    boxes = oracles.random_boxes(64, rng, span=25.0).astype(np.float32)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    idx_f, mask_f = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.3,
                                pre_max_size=64, post_max_size=64, fast=True)
    kept_fast = set(np.asarray(idx_f)[np.asarray(mask_f)].tolist())
    kept_greedy = set(oracles.greedy_nms(boxes, scores, 0.3))
    # fast NMS over-suppresses: kept_fast is a subset of greedy's keeps,
    # and the top-scoring box is always kept
    assert kept_fast <= kept_greedy
    top = int(np.argmax(scores))
    assert top in kept_fast
    # on sparse scenes they should mostly agree
    assert len(kept_fast) >= 0.7 * len(kept_greedy)


def test_clip_and_candidate_overlap_agree():
    rng = np.random.default_rng(12)
    a = oracles.random_boxes(20, rng, span=8.0).astype(np.float32)
    b = oracles.random_boxes(20, rng, span=8.0).astype(np.float32)
    o_clip = np.asarray(iou3d.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b), method="clip"))
    o_cand = np.asarray(iou3d.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b), method="candidates"))
    np.testing.assert_allclose(o_clip, o_cand, atol=5e-3)
