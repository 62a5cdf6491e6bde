"""Golden parity vs the reference's torch-CPU code (/root/reference/cpd).

torch 2.x (CPU) is available in this image, so the reference's pure-torch
formulas -- box coders (box_coder_utils.py), the loss zoo (loss_utils.py,
bbloss.py), and the centernet gaussian-target utilities
(model_utils/centernet_utils.py) -- run directly as oracles against the
cpd_tpu reimplementations. CUDA-only ops (iou3d, spconv, pointnet2) are
covered by their own NumPy oracles in the other test files.
"""
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def torch():
    torch = pytest.importorskip("torch")
    # the reference constructs some tensors with .cuda(); run them on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    return torch


@pytest.fixture(scope="module")
def ref(torch):
    sys.path.insert(0, REFERENCE)
    try:
        from cpd.utils import box_coder_utils, bbloss, loss_utils
        from cpd.models.model_utils import centernet_utils
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return box_coder_utils, bbloss, loss_utils, centernet_utils


def _boxes(seed, n, extra=0):
    rng = np.random.default_rng(seed)
    b = np.zeros((n, 7 + extra), np.float32)
    b[:, :2] = rng.uniform(-40, 40, (n, 2))
    b[:, 2] = rng.uniform(-2, 2, n)
    b[:, 3:6] = rng.uniform(0.5, 6.0, (n, 3))
    b[:, 6] = rng.uniform(-2 * np.pi, 2 * np.pi, n)
    if extra:
        b[:, 7:] = rng.normal(size=(n, extra)).astype(np.float32)
    return b


@pytest.mark.parametrize("sincos", [False, True])
def test_residual_coder_matches(ref, torch, sincos):
    from cpd_tpu.ops.box_coders import ResidualCoder

    box_coder_utils = ref[0]
    boxes, anchors = _boxes(0, 64), _boxes(1, 64)
    r = box_coder_utils.ResidualCoder(encode_angle_by_sincos=sincos)
    # the reference mutates its inputs (clamps dims in place): pass copies
    enc_ref = r.encode_torch(torch.from_numpy(boxes.copy()),
                             torch.from_numpy(anchors.copy())).numpy()
    ours = ResidualCoder(encode_angle_by_sincos=sincos)
    enc = np.asarray(ours.encode(boxes, anchors))
    np.testing.assert_allclose(enc, enc_ref, rtol=1e-5, atol=1e-5)

    dec_ref = r.decode_torch(torch.from_numpy(enc_ref.copy()),
                             torch.from_numpy(anchors.copy())).numpy()
    dec = np.asarray(ours.decode(enc, anchors))
    np.testing.assert_allclose(dec, dec_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sincos", [False, True])
def test_residual_coder_v2_matches(ref, torch, sincos):
    from cpd_tpu.ops.box_coders import ResidualCoderV2

    box_coder_utils = ref[0]
    boxes, anchors = _boxes(2, 64), _boxes(3, 64)
    r = box_coder_utils.ResidualCoderV2(encode_angle_by_sincos=sincos)
    enc_ref = r.encode_torch(torch.from_numpy(boxes.copy()),
                             torch.from_numpy(anchors.copy())).numpy()
    ours = ResidualCoderV2(encode_angle_by_sincos=sincos)
    enc = np.asarray(ours.encode(boxes, anchors))
    np.testing.assert_allclose(enc, enc_ref, rtol=1e-5, atol=1e-5)

    dec_ref = r.decode_torch(torch.from_numpy(enc_ref.copy()),
                             torch.from_numpy(anchors.copy())).numpy()
    dec = np.asarray(ours.decode(enc, anchors))
    np.testing.assert_allclose(dec, dec_ref, rtol=1e-4, atol=1e-4)


def test_point_residual_coder_matches(ref, torch):
    from cpd_tpu.ops.box_coders import PointResidualCoder

    box_coder_utils = ref[0]
    rng = np.random.default_rng(4)
    n = 80
    boxes = _boxes(5, n)
    points = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    classes = rng.integers(1, 4, n)
    mean_size = [[4.6, 2.0, 1.7], [0.9, 0.8, 1.7], [1.8, 0.8, 1.7]]
    r = box_coder_utils.PointResidualCoder(mean_size=mean_size)
    enc_ref = r.encode_torch(torch.from_numpy(boxes.copy()),
                             torch.from_numpy(points),
                             torch.from_numpy(classes)).numpy()
    ours = PointResidualCoder(mean_size=mean_size)
    enc = np.asarray(ours.encode(boxes, points, classes))
    np.testing.assert_allclose(enc, enc_ref, rtol=1e-5, atol=1e-5)

    dec_ref = r.decode_torch(torch.from_numpy(enc_ref.copy()),
                             torch.from_numpy(points),
                             torch.from_numpy(classes)).numpy()
    dec = np.asarray(ours.decode(enc, points, classes))
    np.testing.assert_allclose(dec, dec_ref, rtol=1e-4, atol=1e-4)


def test_sigmoid_focal_loss_matches(ref, torch):
    from cpd_tpu.utils.loss import sigmoid_focal_loss

    loss_utils = ref[2]
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(2, 50, 3)).astype(np.float32) * 3
    targets = (rng.random((2, 50, 3)) < 0.3).astype(np.float32)
    weights = rng.uniform(0, 1, (2, 50)).astype(np.float32)
    m = loss_utils.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)
    out_ref = m(torch.from_numpy(logits), torch.from_numpy(targets),
                torch.from_numpy(weights)).numpy()
    out = np.asarray(sigmoid_focal_loss(logits, targets, weights))
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)


def test_weighted_smooth_l1_matches(ref, torch):
    from cpd_tpu.utils.loss import weighted_smooth_l1_loss

    loss_utils = ref[2]
    rng = np.random.default_rng(7)
    preds = rng.normal(size=(2, 40, 7)).astype(np.float32)
    targets = rng.normal(size=(2, 40, 7)).astype(np.float32)
    weights = rng.uniform(0, 2, (2, 40)).astype(np.float32)
    cw = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0]
    m = loss_utils.WeightedSmoothL1Loss(code_weights=cw)
    out_ref = m(torch.from_numpy(preds), torch.from_numpy(targets),
                torch.from_numpy(weights)).numpy()
    out = np.asarray(weighted_smooth_l1_loss(preds, targets, weights, code_weights=cw))
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)


def test_corner_loss_lidar_matches(ref, torch):
    from cpd_tpu.utils.loss import corner_loss_lidar

    loss_utils = ref[2]
    pred = _boxes(8, 32)
    gt = pred + np.float32(0.1) * _boxes(9, 32)
    gt[:, 3:6] = np.abs(gt[:, 3:6]) + 0.2
    out_ref = loss_utils.get_corner_loss_lidar(
        torch.from_numpy(pred.copy()), torch.from_numpy(gt.copy())).numpy()
    out = np.asarray(corner_loss_lidar(pred, gt, np.ones(32, np.float32)))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-4)


def test_neg_loss_cornernet_matches(ref, torch):
    from cpd_tpu.utils.loss import focal_loss_centernet

    loss_utils = ref[2]
    rng = np.random.default_rng(10)
    gt = rng.random((2, 3, 16, 16)).astype(np.float32) * 0.99
    # plant exact positives like the gaussian targets do
    gt[0, 1, 4, 5] = 1.0
    gt[1, 2, 8, 3] = 1.0
    pred = np.clip(rng.random((2, 3, 16, 16)).astype(np.float32), 1e-4, 1 - 1e-4)
    out_ref = float(loss_utils.neg_loss_cornernet(torch.from_numpy(pred),
                                                  torch.from_numpy(gt)))
    out = float(focal_loss_centernet(pred, gt))
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)


def test_bb_loss_matches(ref, torch):
    from cpd_tpu.utils.loss import bb_loss

    bbloss = ref[1]
    rng = np.random.default_rng(11)
    pred = _boxes(12, 64)
    gt = pred.copy()
    gt[:, :3] += rng.normal(0, 0.4, (64, 3)).astype(np.float32)
    gt[:, 3:6] = np.abs(gt[:, 3:6] + rng.normal(0, 0.3, (64, 3))).astype(np.float32) + 0.2
    gt[:, 6] += rng.normal(0, 0.5, 64).astype(np.float32)
    out_ref = bbloss.bb_loss(torch.from_numpy(pred.copy()),
                             torch.from_numpy(gt.copy())).numpy()
    out = np.asarray(bb_loss(pred, gt))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-4)


def test_gaussian_radius_matches(ref, torch):
    from cpd_tpu.ops.gaussian import gaussian_radius

    centernet_utils = ref[3]
    rng = np.random.default_rng(13)
    h = rng.uniform(1, 30, 50).astype(np.float32)
    w = rng.uniform(1, 30, 50).astype(np.float32)
    for mo in (0.1, 0.5, 0.7):
        r_ref = centernet_utils.gaussian_radius(
            torch.from_numpy(h), torch.from_numpy(w), min_overlap=mo).numpy()
        r = np.asarray(gaussian_radius(h, w, min_overlap=mo))
        np.testing.assert_allclose(r, r_ref, rtol=1e-4, atol=1e-4)


def test_draw_gaussian_matches(ref, torch):
    """Our vectorized heatmap rendering == the reference's in-place stamp for
    an interior center (the reference crops at borders identically)."""
    from cpd_tpu.ops.gaussian import _render_gaussian
    import jax.numpy as jnp

    centernet_utils = ref[3]
    h = w = 32
    center, radius = (11, 19), 4
    hm_ref = torch.zeros((h, w))
    centernet_utils.draw_gaussian_to_heatmap(hm_ref, torch.tensor(center), radius)
    ours = np.asarray(_render_gaussian(jnp.float32(center[0]), jnp.float32(center[1]),
                                       jnp.float32(radius), (h, w)))
    np.testing.assert_allclose(ours, hm_ref.numpy(), rtol=1e-4, atol=1e-4)
