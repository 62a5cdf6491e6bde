"""Reference state_dict conversion: synthetic round-trip on the tiny model."""
import numpy as np
import jax
import pytest

from cpd_tpu.models.detector import VoxelRCNN
from cpd_tpu.utils.torch_import import (
    convert_conv2d_weight, convert_reference_state_dict, convert_spconv_weight,
)
from .test_model_e2e import TINY, make_batch


def test_spconv_weight_layouts():
    rng = np.random.default_rng(0)
    w2x = rng.normal(size=(16, 3, 3, 3, 5)).astype(np.float32)  # (Cout, kz, ky, kx, Cin)
    out = convert_spconv_weight(w2x, cin=5, cout=16)
    assert out.shape == (27, 5, 16)
    np.testing.assert_allclose(out[0, :, 0], w2x[0, 0, 0, 0, :])
    w1x = rng.normal(size=(3, 3, 3, 5, 16)).astype(np.float32)
    out1 = convert_spconv_weight(w1x, cin=5, cout=16)
    assert out1.shape == (27, 5, 16)
    np.testing.assert_allclose(out1[0], w1x[0, 0, 0])


def test_conv2d_weight_layout():
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    out = convert_conv2d_weight(w)
    assert out.shape == (5, 7, 3, 2)
    assert out[0, 0, 0, 0] == w[0, 0, 0, 0]


@pytest.mark.slow
def test_reference_state_dict_grafts_backbone():
    model = VoxelRCNN(**TINY)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, True)
    params, stats = variables["params"], variables["batch_stats"]

    cin = 5
    sd = {
        # conv_input: SubMConv3d(5->16) + BN
        "backbone_3d.conv_input.0.weight": rng.normal(size=(16, 3, 3, 3, cin)).astype(np.float32),
        "backbone_3d.conv_input.1.weight": np.full(16, 2.0, np.float32),
        "backbone_3d.conv_input.1.bias": np.full(16, 0.5, np.float32),
        "backbone_3d.conv_input.1.running_mean": np.full(16, 0.1, np.float32),
        "backbone_3d.conv_input.1.running_var": np.full(16, 0.9, np.float32),
        # res block 1a conv1
        "backbone_3d.conv1.0.conv1.weight": rng.normal(size=(16, 3, 3, 3, 16)).astype(np.float32),
        "backbone_3d.conv1.0.bn1.weight": np.full(16, 3.0, np.float32),
        # strided down2: conv2.0.0 + bn conv2.0.1, then block conv2.1.conv1
        "backbone_3d.conv2.0.0.weight": rng.normal(size=(32, 3, 3, 3, 16)).astype(np.float32),
        "backbone_3d.conv2.0.1.weight": np.full(32, 4.0, np.float32),
        "backbone_3d.conv2.1.conv1.weight": rng.normal(size=(32, 3, 3, 3, 32)).astype(np.float32),
        # mm branch conv_input_2
        "backbone_3d.conv_input_2.0.weight": rng.normal(size=(16, 3, 3, 3, cin)).astype(np.float32),
        # an unknown key
        "some.unknown.key": np.zeros(3, np.float32),
    }
    new_params, new_stats, report = convert_reference_state_dict(sd, params, stats)
    assert "some.unknown.key" in report["missed"]
    assert len(report["matched"]) >= 7, report
    # spot checks
    w = new_params["backbone"]["branch0"]["conv_input"]["kernel"]
    want = convert_spconv_weight(sd["backbone_3d.conv_input.0.weight"], cin, 16)
    np.testing.assert_allclose(np.asarray(w), want, atol=1e-6)
    bn = new_params["backbone"]["branch0"]["conv_input"]["MaskedBatchNorm_0"]
    np.testing.assert_allclose(np.asarray(bn["scale"]), 2.0)
    st = new_stats["backbone"]["branch0"]["conv_input"]["MaskedBatchNorm_0"]
    np.testing.assert_allclose(np.asarray(st["var"]), 0.9)
    w2 = new_params["backbone"]["branch0"]["down2"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(w2), convert_spconv_weight(sd["backbone_3d.conv2.0.0.weight"], 16, 32), atol=1e-6)
    w1a = new_params["backbone"]["branch0"]["res1a"]["SubMConvBN_0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(w1a), convert_spconv_weight(sd["backbone_3d.conv1.0.conv1.weight"], 16, 16), atol=1e-6)
    wmm = new_params["backbone"]["branch1"]["conv_input"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(wmm), convert_spconv_weight(sd["backbone_3d.conv_input_2.0.weight"], cin, 16), atol=1e-6)
