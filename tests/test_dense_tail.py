"""Dense-tail backbone parity: stage 4 + conv_out as dense conv3d must equal
the sparse rulebook path (same parameters, same keys, numerically equal
activations up to bf16 rounding). See backbone3d.ResBranch._dense_tail."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpd_tpu.models.backbone3d import VoxelResBackBone8x, stage_grids
from cpd_tpu.ops import sparse
from cpd_tpu.ops.sparse import INVALID_KEY, GridSpec

GRID = GridSpec(32, 32, 26)
CAPS = (512, 256, 160, 160)
FILTERS = (4, 8, 16, 32)


def _random_sparse(rng, batch, n):
    keys = np.stack([
        np.sort(rng.choice(GRID.num_cells, n, replace=False)).astype(np.int32)
        for _ in range(batch)
    ])
    # pad a tail to exercise INVALID_KEY handling
    keys[:, -n // 8:] = INVALID_KEY
    feats = rng.standard_normal((batch, n, 4)).astype(np.float32)
    feats[keys == INVALID_KEY] = 0.0
    return jnp.asarray(feats), jnp.asarray(keys)


def _models(compute_dtype=jnp.bfloat16):
    kw = dict(grid=GRID, num_filters=FILTERS, caps=CAPS, mm=False,
              compute_dtype=compute_dtype)
    return (VoxelResBackBone8x(**kw, dense_tail=False),
            VoxelResBackBone8x(**kw, dense_tail=True))


def _assert_close(a, b, what):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, rtol=0.15, atol=0.15, err_msg=what)
    scale = max(np.abs(a).max(), 1e-3)
    assert np.abs(a - b).max() <= 0.05 * scale + 0.05, what


def test_dense_tail_matches_sparse_eval():
    rng = np.random.default_rng(0)
    feats, keys = _random_sparse(rng, 2, 300)
    m_sparse, m_dense = _models()
    variables = m_sparse.init(jax.random.PRNGKey(0), feats, keys, False)
    # identical parameter tree: the dense tail reuses the sparse modules
    v2 = m_dense.init(jax.random.PRNGKey(0), feats, keys, False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    out_s = m_sparse.apply(variables, feats, keys, False)
    out_d = m_dense.apply(variables, feats, keys, False)

    assert "encoded_bev" in out_d
    for name in ("x_conv4", "encoded"):
        fs, ks, _ = out_s[name]
        fd, kd, _ = out_d[name]
        np.testing.assert_array_equal(np.asarray(ks), np.asarray(kd), err_msg=name)
        _assert_close(fs, fd, name)

    # the dense BEV map equals height-compressing the sparse encoded tensor
    fs, ks, g = out_s["encoded"]
    b, _, c = fs.shape
    dense = jax.vmap(lambda f, k: sparse.to_dense(f, k, g, c))(fs, ks)
    bev_s = jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, g.ny, g.nx, g.nz * c)
    _assert_close(bev_s, out_d["encoded_bev"], "encoded_bev")


def test_dense_tail_train_stats_and_grads():
    # f32 compute: the two formulations are algebraically identical, so the
    # gradients must agree tightly (bf16 runs differ only by accumulation
    # order/rounding across the deep backward chain -- checked finite below)
    rng = np.random.default_rng(1)
    feats, keys = _random_sparse(rng, 2, 300)
    m_sparse, m_dense = _models(compute_dtype=None)
    variables = m_sparse.init(jax.random.PRNGKey(0), feats, keys, True)

    outs = {}
    for name, m in (("sparse", m_sparse), ("dense", m_dense)):
        def loss_fn(params):
            out, upd = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, keys, True, mutable=["batch_stats"])
            return jnp.sum(out["encoded"][0].astype(jnp.float32) ** 2), upd
        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        outs[name] = (loss, upd, grads)

    ls, us, gs = outs["sparse"]
    ld, ud, gd = outs["dense"]
    assert np.isfinite(float(ls)) and np.isfinite(float(ld))
    np.testing.assert_allclose(float(ld), float(ls), rtol=1e-4)
    # batch statistics of the stage-4 BNs agree (masked moments over the same
    # occupied sites)
    s4 = us["batch_stats"]["branch0"]["down4"]["MaskedBatchNorm_0"]
    d4 = ud["batch_stats"]["branch0"]["down4"]["MaskedBatchNorm_0"]
    np.testing.assert_allclose(np.asarray(d4["mean"]), np.asarray(s4["mean"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d4["var"]), np.asarray(s4["var"]),
                               rtol=1e-4, atol=1e-5)
    # gradients agree tightly in f32, for stage-4 params and upstream alike
    for path in (("branch0", "down3", "kernel"), ("branch0", "down4", "kernel"),
                 ("branch0", "res4a", "SubMConvBN_0", "kernel"),
                 ("branch0", "conv_out", "kernel"),
                 ("branch0", "conv_input", "kernel")):
        a, b = gs, gd
        for p in path:
            a, b = a[p], b[p]
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-5,
            err_msg="/".join(path))

    # bf16 models: gradients finite everywhere
    m_sparse16, m_dense16 = _models()
    v16 = m_sparse16.init(jax.random.PRNGKey(0), feats, keys, True)

    def loss16(params):
        out, _ = m_dense16.apply(
            {"params": params, "batch_stats": v16["batch_stats"]},
            feats, keys, True, mutable=["batch_stats"])
        return jnp.sum(out["encoded"][0].astype(jnp.float32) ** 2)

    g16 = jax.grad(loss16)(v16["params"])
    for g in jax.tree_util.tree_leaves(g16):
        assert np.all(np.isfinite(np.asarray(g, np.float32)))


def test_dense_tail_light_branch_mm():
    rng = np.random.default_rng(2)
    feats, keys = _random_sparse(rng, 1, 250)
    feats1, keys1 = _random_sparse(rng, 1, 200)
    kw = dict(grid=GRID, num_filters=FILTERS, caps=CAPS, mm=True)
    m_sparse = VoxelResBackBone8x(**kw, dense_tail=False)
    m_dense = VoxelResBackBone8x(**kw, dense_tail=True)
    variables = m_sparse.init(jax.random.PRNGKey(0), feats, keys, True,
                              feats1, keys1)
    out_s, _ = m_sparse.apply(variables, feats, keys, True, feats1, keys1,
                              mutable=["batch_stats"])
    out_d, _ = m_dense.apply(variables, feats, keys, True, feats1, keys1,
                             mutable=["batch_stats"])
    fs, ks, _ = out_s["x_conv4_mm"]
    fd, kd, _ = out_d["x_conv4_mm"]
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(kd))
    _assert_close(fs, fd, "x_conv4_mm")


def test_keys_from_dense_mask_roundtrip():
    rng = np.random.default_rng(3)
    n_cells = 400
    mask = rng.random(n_cells) < 0.2
    keys, valid = sparse.keys_from_dense_mask(jnp.asarray(mask), 128)
    expect = np.nonzero(mask)[0].astype(np.int32)[:128]
    got = np.asarray(keys)[np.asarray(valid)]
    np.testing.assert_array_equal(got, expect)
    assert np.all(np.asarray(keys)[len(expect):] == INVALID_KEY)

    # cap overflow drops the HIGHEST keys (same tail the capped rulebook drops)
    cap = int(mask.sum()) - 5
    keys2, valid2 = sparse.keys_from_dense_mask(jnp.asarray(mask), cap)
    np.testing.assert_array_equal(
        np.asarray(keys2)[np.asarray(valid2)],
        np.nonzero(mask)[0].astype(np.int32)[:cap])
