"""roiaware_pool3d / roipoint_pool3d vs NumPy oracles."""
import numpy as np
import jax.numpy as jnp

from cpd_tpu.ops.roipool import roiaware_pool3d, roipoint_pool3d


def _scene(seed=0, n=500, m=3):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 4)).astype(np.float32)
    boxes = np.zeros((m, 7), np.float32)
    boxes[:, :2] = rng.uniform(-6, 6, (m, 2))
    boxes[:, 2] = rng.uniform(-2, 2, m)
    boxes[:, 3:6] = rng.uniform(2, 6, (m, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, m)
    return pts, feats, boxes


def _local(pts, box):
    sh = pts[:, :3] - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    lx = sh[:, 0] * c - sh[:, 1] * s
    ly = sh[:, 0] * s + sh[:, 1] * c
    return np.stack([lx, ly, sh[:, 2]], 1)


def test_roiaware_pool3d_max_and_avg():
    pts, feats, boxes = _scene()
    g = 4
    for method in ("max", "avg"):
        out = np.asarray(roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                         jnp.asarray(boxes), g, method))
        assert out.shape == (3, g, g, g, 4)
        for bi, box in enumerate(boxes):
            loc = _local(pts, box)
            inside = (np.abs(loc) <= box[3:6] / 2).all(1)
            cell = np.clip(np.floor((loc + box[3:6] / 2) / (box[3:6] / g)), 0, g - 1).astype(int)
            want = np.zeros((g, g, g, 4))
            for ci in range(g):
                for cj in range(g):
                    for ck in range(g):
                        m = inside & (cell[:, 0] == ci) & (cell[:, 1] == cj) & (cell[:, 2] == ck)
                        if m.any():
                            want[ci, cj, ck] = (feats[m].max(0) if method == "max"
                                                else feats[m].mean(0))
            np.testing.assert_allclose(out[bi], want, atol=1e-5)


def test_roipoint_pool3d_first_k_order():
    pts, feats, boxes = _scene(1)
    k = 16
    pooled, valid, empty = roipoint_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                           jnp.asarray(boxes), k)
    pooled, valid, empty = np.asarray(pooled), np.asarray(valid), np.asarray(empty)
    for bi, box in enumerate(boxes):
        loc = _local(pts, box)
        inside = (np.abs(loc) <= box[3:6] / 2).all(1)
        idx = np.nonzero(inside)[0][:k]
        assert empty[bi] == (len(np.nonzero(inside)[0]) == 0)
        assert valid[bi].sum() == len(idx)
        np.testing.assert_allclose(pooled[bi][: len(idx), :3], pts[idx], atol=1e-6)
        np.testing.assert_allclose(pooled[bi][: len(idx), 3:], feats[idx], atol=1e-6)
