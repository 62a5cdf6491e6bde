import numpy as np
import jax
import jax.numpy as jnp

from cpd_tpu.models.atss import atss_assign
from cpd_tpu.models.anchor_head import generate_anchors
from cpd_tpu.models.transformer import TransformerDecoder, TransformerEncoder


def test_atss_assigns_near_anchors():
    anch = generate_anchors((16, 16), [-8, -8, -2, 8, 8, 4], [(4.0, 2.0, 1.5)], (0.0,))
    aflat = anch.reshape(-1, 7)
    gt = jnp.asarray([[0.5, 0.5, -0.25, 4.0, 2.0, 1.5, 0.0, 1.0]])
    out = atss_assign(aflat, gt, jnp.asarray([True]))
    labels = np.asarray(out["labels"])
    fg = labels >= 0
    assert fg.sum() >= 1
    # fg anchors must be near the gt center
    d = np.linalg.norm(np.asarray(aflat)[fg][:, :2] - [0.5, 0.5], axis=1)
    assert d.max() < 3.0


def test_transformer_toolbox_shapes():
    enc = TransformerEncoder(dim=64, depth=2, heads=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 32)).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), x)
    mem = enc.apply(v, x)
    assert mem.shape == (2, 10, 64)
    dec = TransformerDecoder(dim=64, depth=1, heads=2, num_queries=5)
    vd = dec.init(jax.random.PRNGKey(1), mem)
    out = dec.apply(vd, mem)
    assert out.shape == (2, 5, 64)
    assert np.isfinite(np.asarray(out)).all()
