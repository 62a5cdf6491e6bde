import numpy as np
import jax
import jax.numpy as jnp

from cpd_tpu.ops.dcn import DeformConv2d, deform_conv2d
from cpd_tpu.utils.loss import odiou_3d


def test_deform_conv_zero_offsets_matches_conv():
    """With zero offsets and unit mask, DCN == plain 3x3 conv."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(9, 4, 6)).astype(np.float32) * 0.2
    offsets = np.zeros((8, 8, 18), np.float32)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w)))
    # manual conv with SAME padding
    import scipy.signal as ss
    want = np.zeros((8, 8, 6))
    taps = [(i - 1, j - 1) for i in range(3) for j in range(3)]
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
    for t, (ti, tj) in enumerate(taps):
        shifted = xp[1 + ti:9 + ti, 1 + tj:9 + tj]
        want += shifted @ w[t]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_deform_conv_module_grads():
    m = DeformConv2d(features=8)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 4)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 8)
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(v["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)


def test_odiou_loss_and_grad():
    pred = jnp.asarray([[0.2, 0, 0, 4, 2, 1.5, 0.1]], dtype=jnp.float32)
    gt = jnp.asarray([[0.0, 0, 0, 4, 2, 1.5, 0.0]], dtype=jnp.float32)
    loss = float(odiou_3d(pred, gt))
    assert 0 < loss < 1
    g = jax.grad(lambda p: odiou_3d(p, gt))(pred)
    assert np.isfinite(np.asarray(g)).all()
    # moving toward gt reduces the loss
    better = pred.at[0, 0].set(0.05)
    assert float(odiou_3d(better, gt)) < loss
