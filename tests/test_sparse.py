import numpy as np
import jax.numpy as jnp

from cpd_tpu.ops import sparse
from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY


def make_sparse(rng, grid, n_active, cap, cin):
    """Random sorted sparse tensor with padding."""
    cells = grid.num_cells
    keys = rng.choice(cells, size=n_active, replace=False).astype(np.int32)
    keys = np.sort(keys)
    feats = rng.normal(size=(n_active, cin)).astype(np.float32)
    pad_keys = np.full(cap - n_active, INVALID_KEY, dtype=np.int32)
    pad_feats = np.zeros((cap - n_active, cin), dtype=np.float32)
    return (
        np.concatenate([feats, pad_feats]),
        np.concatenate([keys, pad_keys]),
    )


def dense_from_sparse(feats, keys, grid, cin):
    dense = np.zeros((grid.nz, grid.ny, grid.nx, cin), dtype=np.float32)
    for f, k in zip(feats, keys):
        if k == INVALID_KEY:
            continue
        x = k % grid.nx
        y = (k // grid.nx) % grid.ny
        z = k // (grid.nx * grid.ny)
        dense[z, y, x] = f
    return dense


def dense_conv3d(dense, weights, kernel, stride, padding):
    """Oracle: naive dense conv. weights (K, Cin, Cout) in zyx-offset order."""
    kx, ky, kz = kernel
    sx, sy, sz = stride
    px, py, pz = padding
    nz, ny, nx, cin = dense.shape
    cout = weights.shape[-1]
    onz = (nz + 2 * pz - kz) // sz + 1
    ony = (ny + 2 * py - ky) // sy + 1
    onx = (nx + 2 * px - kx) // sx + 1
    out = np.zeros((onz, ony, onx, cout), dtype=np.float32)
    w = weights.reshape(kz, ky, kx, cin, cout)
    for oz in range(onz):
        for oy in range(ony):
            for ox in range(onx):
                acc = np.zeros(cout, dtype=np.float32)
                for dz in range(kz):
                    for dy in range(ky):
                        for dx in range(kx):
                            iz = oz * sz - pz + dz
                            iy = oy * sy - py + dy
                            ix = ox * sx - px + dx
                            if 0 <= iz < nz and 0 <= iy < ny and 0 <= ix < nx:
                                acc += dense[iz, iy, ix] @ w[dz, dy, dx]
                out[oz, oy, ox] = acc
    return out


def test_bitmap_out_keys_match_sort_path():
    """The bitmap dilate+subsample active-set derivation must agree with the
    candidate-sort derivation for every ladder shape (incl. overflow caps)."""
    rng = np.random.default_rng(7)
    cases = [
        # (grid, kernel, stride, padding)
        ((37, 29, 11), (3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((64, 64, 8), (3, 3, 3), (2, 2, 2), (1, 1, 0)),
        ((33, 65, 5), (1, 1, 3), (1, 1, 2), (0, 0, 0)),
        ((70, 40, 6), (3, 3, 1), (2, 2, 1), (1, 1, 0)),
        ((32, 32, 4), (3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ]
    for (nx, ny, nz), kernel, stride, padding in cases:
        grid = sparse.GridSpec(nx, ny, nz)
        out_grid = grid.downsample(stride, padding, kernel)
        for density, cap_frac in ((0.02, 1.0), (0.3, 1.0), (0.3, 0.4)):
            n = max(int(grid.num_cells * density), 4)
            cells = np.sort(rng.choice(grid.num_cells, n, replace=False))
            v_cap = n + 7
            keys = np.full(v_cap, sparse.INVALID_KEY, np.int32)
            keys[:n] = cells
            cap = max(int(out_grid.num_cells * density * 6 * cap_frac), 8)
            kb, vb = sparse._strided_out_keys_bitmap(
                jnp.asarray(keys), grid, out_grid, kernel, stride, padding, cap)
            ks, vs = sparse._strided_out_keys_sort(
                jnp.asarray(keys), grid, out_grid, kernel, stride, padding, cap)
            np.testing.assert_array_equal(np.asarray(kb), np.asarray(ks))
            np.testing.assert_array_equal(np.asarray(vb), np.asarray(vs))


def test_subm_conv_matches_dense():
    rng = np.random.default_rng(0)
    grid = GridSpec(nx=10, ny=9, nz=5)
    cin, cout = 4, 6
    feats, keys = make_sparse(rng, grid, n_active=60, cap=80, cin=cin)
    weights = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
    rb = sparse.build_subm_rulebook(jnp.asarray(keys), grid, (3, 3, 3))
    out = np.asarray(sparse.sparse_conv_apply(jnp.asarray(feats), rb, jnp.asarray(weights)))
    dense = dense_from_sparse(feats, keys, grid, cin)
    want_dense = dense_conv3d(dense, weights, (3, 3, 3), (1, 1, 1), (1, 1, 1))
    for i, k in enumerate(keys):
        if k == INVALID_KEY:
            assert np.all(out[i] == 0)
            continue
        x = k % grid.nx
        y = (k // grid.nx) % grid.ny
        z = k // (grid.nx * grid.ny)
        np.testing.assert_allclose(out[i], want_dense[z, y, x], atol=1e-4)


def test_strided_conv_matches_dense():
    rng = np.random.default_rng(1)
    grid = GridSpec(nx=12, ny=10, nz=6)
    cin, cout = 3, 5
    feats, keys = make_sparse(rng, grid, n_active=70, cap=96, cin=cin)
    weights = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
    rb, out_grid = sparse.build_conv_rulebook(
        jnp.asarray(keys), grid, kernel=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1), out_cap=96
    )
    out = np.asarray(sparse.sparse_conv_apply(jnp.asarray(feats), rb, jnp.asarray(weights)))
    dense = dense_from_sparse(feats, keys, grid, cin)
    want_dense = dense_conv3d(dense, weights, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    assert (out_grid.nz, out_grid.ny, out_grid.nx) == want_dense.shape[:3]
    out_keys = np.asarray(rb.out_keys)
    out_valid = np.asarray(rb.out_valid)
    # every valid output site must match the dense conv
    for i in np.where(out_valid)[0]:
        k = out_keys[i]
        x = k % out_grid.nx
        y = (k // out_grid.nx) % out_grid.ny
        z = k // (out_grid.nx * out_grid.ny)
        np.testing.assert_allclose(out[i], want_dense[z, y, x], atol=1e-4)
    # every nonzero dense output site must be in the active set (no dropped sites)
    active = set(out_keys[out_valid].tolist())
    nz_sites = np.argwhere(np.abs(want_dense).sum(-1) > 1e-6)
    for z, y, x in nz_sites:
        k = (z * out_grid.ny + y) * out_grid.nx + x
        assert k in active


def test_conv_out_asymmetric_kernel():
    """spconv_out of the reference backbone: kernel (3,1,1) zyx with stride (2,1,1) on z."""
    rng = np.random.default_rng(2)
    grid = GridSpec(nx=8, ny=8, nz=5)
    cin, cout = 4, 4
    feats, keys = make_sparse(rng, grid, n_active=40, cap=64, cin=cin)
    # kernel in (x, y, z) = (1, 1, 3), stride (1, 1, 2), padding 0
    kernel, stride, padding = (1, 1, 3), (1, 1, 2), (0, 0, 0)
    kvol = 3
    weights = rng.normal(size=(kvol, cin, cout)).astype(np.float32) * 0.3
    rb, out_grid = sparse.build_conv_rulebook(
        jnp.asarray(keys), grid, kernel=kernel, stride=stride, padding=padding, out_cap=64
    )
    out = np.asarray(sparse.sparse_conv_apply(jnp.asarray(feats), rb, jnp.asarray(weights)))
    dense = dense_from_sparse(feats, keys, grid, cin)
    want_dense = dense_conv3d(dense, weights, kernel, stride, padding)
    out_keys = np.asarray(rb.out_keys)
    for i in np.where(np.asarray(rb.out_valid))[0]:
        k = out_keys[i]
        x = k % out_grid.nx
        y = (k // out_grid.nx) % out_grid.ny
        z = k // (out_grid.nx * out_grid.ny)
        np.testing.assert_allclose(out[i], want_dense[z, y, x], atol=1e-4)


def test_to_dense_roundtrip():
    rng = np.random.default_rng(3)
    grid = GridSpec(nx=6, ny=5, nz=3)
    feats, keys = make_sparse(rng, grid, n_active=20, cap=32, cin=4)
    dense = np.asarray(sparse.to_dense(jnp.asarray(feats), jnp.asarray(keys), grid, 4))
    want = dense_from_sparse(feats, keys, grid, 4)
    np.testing.assert_allclose(dense, want, atol=0)


def test_masked_batch_stats():
    rng = np.random.default_rng(4)
    f = rng.normal(size=(2, 10, 3)).astype(np.float32)
    valid = rng.uniform(size=(2, 10)) > 0.4
    mean, var = sparse.masked_batch_stats(jnp.asarray(f), jnp.asarray(valid))
    sel = f[valid]
    np.testing.assert_allclose(np.asarray(mean), sel.mean(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), sel.var(0), atol=1e-5)


def _grad_pair(feats, keys, grid, kernel, stride, padding, out_cap, seed=3):
    """(custom-VJP grads, autodiff grads) for one strided conv."""
    import jax

    rng = np.random.default_rng(seed)
    rb, out_grid = sparse.build_conv_rulebook_batched(
        keys[None], grid, kernel, stride, padding, out_cap)
    rb_t = sparse.build_inverse_rulebook_batched(
        keys[None], rb.out_keys, grid, out_grid, kernel, stride, padding)
    k = kernel[0] * kernel[1] * kernel[2]
    cin = feats.shape[-1]
    w = rng.normal(size=(k, cin, 5)).astype(np.float32)
    cot = rng.normal(size=(1, out_cap, 5)).astype(np.float32)

    def loss(transpose):
        def f(x, wt):
            out = sparse.sparse_conv_apply_batched(
                x, rb, wt, transpose=transpose)
            return jnp.sum(out * cot)
        return jax.grad(f, argnums=(0, 1))(jnp.asarray(feats[None]), jnp.asarray(w))

    return loss(rb_t), loss(None)


def test_custom_vjp_strided_matches_autodiff():
    rng = np.random.default_rng(11)
    grid = GridSpec(14, 12, 9)
    feats, keys = make_sparse(rng, grid, 150, 200, 7)
    (dx_c, dw_c), (dx_a, dw_a) = _grad_pair(
        feats, keys, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 160)
    np.testing.assert_allclose(dx_c, dx_a, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dw_c, dw_a, rtol=1e-5, atol=1e-5)


def test_custom_vjp_strided_asymmetric_matches_autodiff():
    rng = np.random.default_rng(12)
    grid = GridSpec(10, 10, 8)
    feats, keys = make_sparse(rng, grid, 120, 150, 4)
    (dx_c, dw_c), (dx_a, dw_a) = _grad_pair(
        feats, keys, grid, (1, 1, 3), (1, 1, 2), (0, 0, 0), 150)
    np.testing.assert_allclose(dx_c, dx_a, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dw_c, dw_a, rtol=1e-5, atol=1e-5)


def test_custom_vjp_subm_mirror_matches_autodiff():
    import jax

    rng = np.random.default_rng(13)
    grid = GridSpec(12, 11, 7)
    feats, keys = make_sparse(rng, grid, 140, 180, 6)
    rb = sparse.build_subm_rulebook_batched(jnp.asarray(keys)[None], grid)
    w = rng.normal(size=(27, 6, 5)).astype(np.float32)
    cot = rng.normal(size=(1, 180, 5)).astype(np.float32)

    def grads(transpose):
        def f(x, wt):
            out = sparse.sparse_conv_apply_batched(x, rb, wt, transpose=transpose)
            return jnp.sum(out * cot)
        return jax.grad(f, argnums=(0, 1))(jnp.asarray(feats[None]), jnp.asarray(w))

    (dx_c, dw_c) = grads("mirror")
    (dx_a, dw_a) = grads(None)
    np.testing.assert_allclose(dx_c, dx_a, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dw_c, dw_a, rtol=1e-5, atol=1e-5)


def test_custom_vjp_forward_identical():
    rng = np.random.default_rng(14)
    grid = GridSpec(12, 11, 7)
    feats, keys = make_sparse(rng, grid, 140, 180, 6)
    rb = sparse.build_subm_rulebook_batched(jnp.asarray(keys)[None], grid)
    w = rng.normal(size=(27, 6, 5)).astype(np.float32)
    a = sparse.sparse_conv_apply_batched(jnp.asarray(feats[None]), rb, jnp.asarray(w))
    b = sparse.sparse_conv_apply_batched(jnp.asarray(feats[None]), rb, jnp.asarray(w),
                                         transpose="mirror")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_dense_lut_corner_voxel_not_clobbered():
    """Regression: padding rows used to scatter -1 into LUT cell 0, hiding a
    real active voxel at the grid corner (linearized key 0)."""
    grid = GridSpec(4, 4, 4)
    keys = jnp.asarray([0, 5, 9, INVALID_KEY, INVALID_KEY], jnp.int32)
    lut = np.asarray(sparse.build_dense_lut(keys, grid)).reshape(-1)
    assert int(lut[0]) == 0
    assert int(lut[5]) == 1
    assert int(lut[9]) == 2
    lut = sparse.build_dense_lut(keys, grid)
    idx, found = sparse.lookup_dense(lut, jnp.asarray([0, 1]), jnp.asarray([True, True]))
    assert bool(found[0]) and int(idx[0]) == 0
    assert not bool(found[1])


def test_bitmap_lut_matches_dense():
    """bitmap-rank LUT: row/found agree with the dense LUT on random keys."""
    rng = np.random.default_rng(21)
    grid = GridSpec(37, 29, 5)
    n_occ = 400
    keys = np.sort(rng.choice(grid.num_cells, n_occ, replace=False)).astype(np.int32)
    kk = np.concatenate([keys, np.full(60, INVALID_KEY, np.int32)])
    bm = sparse.build_bitmap_lut(jnp.asarray(kk), grid)
    lut = sparse.build_dense_lut(jnp.asarray(kk), grid)
    q = rng.integers(0, grid.num_cells, 1000).astype(np.int32)
    ok = jnp.ones(1000, bool)
    ib, fb = sparse.lookup_bitmap(bm, jnp.asarray(q), ok)
    idd, fd = sparse.lookup_dense(lut, jnp.asarray(q), ok)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fd))
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(idd))
    # row rank == sorted position
    hit = np.asarray(fb)
    pos = np.searchsorted(keys, q[hit])
    np.testing.assert_array_equal(np.asarray(ib)[hit], pos)


def test_bitmap_packed_taps_matches_dense_packed():
    rng = np.random.default_rng(22)
    grid = GridSpec(23, 19, 7)
    n_occ = 350
    keys = np.sort(rng.choice(grid.num_cells, n_occ, replace=False)).astype(np.int32)
    kk = np.concatenate([keys, np.full(50, INVALID_KEY, np.int32)])
    bm = sparse.build_bitmap_lut(jnp.asarray(kk), grid)
    lut = sparse.build_dense_lut(jnp.asarray(kk), grid)
    offsets = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
               for dx in (-1, 0, 1) if (dz, dy, dx) != (0, 0, 0)]
    coords = np.stack([kk // (grid.nx * grid.ny),
                       (kk // grid.nx) % grid.ny,
                       kk % grid.nx], axis=1)
    offs = np.asarray(offsets)
    nc = coords[None] + offs[:, None]
    ok = ((nc[..., 2] >= 0) & (nc[..., 2] < grid.nx)
          & (nc[..., 1] >= 0) & (nc[..., 1] < grid.ny)
          & (nc[..., 0] >= 0) & (nc[..., 0] < grid.nz)
          & (kk != INVALID_KEY)[None])
    ib, fb = sparse.lookup_bitmap_packed_taps(
        bm, jnp.asarray(kk), offsets, grid, jnp.asarray(ok))
    idd, fd = sparse.lookup_packed_taps(
        lut, jnp.asarray(kk), offsets, grid, jnp.asarray(ok))
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fd))
    np.testing.assert_array_equal(np.asarray(ib) * np.asarray(fb),
                                  np.asarray(idd) * np.asarray(fd))


def test_im2col_formulations_agree(monkeypatch):
    """The im2col mode switch (_im2col_mode: per-tap / flattened / windowed /
    windowed-flat) is purely a lowering choice: every formulation must produce
    identical conv outputs and custom-VJP gradients (the windowed forms
    additionally exercise the dx-run rank-adjacency invariant)."""
    import jax

    rng = np.random.default_rng(31)
    grid = GridSpec(13, 11, 7)
    n_occ, cap = 220, 256
    keys = np.sort(rng.choice(grid.num_cells, n_occ, replace=False)).astype(np.int32)
    kk = np.concatenate([keys, np.full(cap - n_occ, INVALID_KEY, np.int32)])[None]
    feats = rng.normal(size=(1, cap, 6)).astype(np.float32)
    feats[0, n_occ:] = 0
    w = rng.normal(size=(27, 6, 8)).astype(np.float32) * 0.2
    rb = sparse.build_subm_rulebook_batched(jnp.asarray(kk), grid)

    def run():
        def loss(f, ww):
            o = sparse.sparse_conv_apply_batched(
                jnp.asarray(f), rb, ww, transpose="mirror", win_run=3)
            return jnp.sum(o * o), o

        (l, o), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            jnp.asarray(feats), jnp.asarray(w))
        o_plain = sparse.sparse_conv_apply_batched(jnp.asarray(feats), rb,
                                                   jnp.asarray(w), win_run=3)
        return np.asarray(o), np.asarray(g[0]), np.asarray(g[1]), np.asarray(o_plain)

    results = {}
    for mode in ("per-tap", "flat", "win", "win-flat", "win-g", "tap-g"):
        monkeypatch.setattr(sparse, "_im2col_mode", lambda s, c, r, _m=mode: _m)
        results[mode] = run()
    ref = results["per-tap"]
    for mode in ("flat", "win", "win-flat", "win-g", "tap-g"):
        got = results[mode]
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-5, atol=1e-5, err_msg=mode)
        np.testing.assert_allclose(got[1], ref[1], rtol=1e-5, atol=1e-5, err_msg=mode)
        np.testing.assert_allclose(got[2], ref[2], rtol=1e-5, atol=1e-4, err_msg=mode)
        np.testing.assert_allclose(got[3], ref[3], rtol=1e-5, atol=1e-5, err_msg=mode)


def test_windowed_gather_strided_and_inverse_rulebooks(monkeypatch):
    """Windowed gathers on a STRIDED conv (forward rulebook + inverse-rulebook
    backward): the rank-adjacency invariant must hold for both tables."""
    import jax

    rng = np.random.default_rng(77)
    grid = GridSpec(14, 12, 8)
    n_occ, cap, out_cap = 300, 320, 256
    keys = np.sort(rng.choice(grid.num_cells, n_occ, replace=False)).astype(np.int32)
    kk = np.concatenate([keys, np.full(cap - n_occ, INVALID_KEY, np.int32)])[None]
    feats = rng.normal(size=(1, cap, 5)).astype(np.float32)
    feats[0, n_occ:] = 0
    w = rng.normal(size=(27, 5, 8)).astype(np.float32) * 0.2
    rb, out_grid = sparse.build_conv_rulebook_batched(
        jnp.asarray(kk), grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_cap)
    inv = sparse.build_inverse_rulebook_batched(
        jnp.asarray(kk), rb.out_keys, grid, out_grid, (3, 3, 3), (2, 2, 2), (1, 1, 1))

    def run():
        def loss(f, ww):
            o = sparse.sparse_conv_apply_batched(
                jnp.asarray(f), rb, ww, transpose=inv, win_run=3)
            return jnp.sum(o * o), o

        (_, o), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            jnp.asarray(feats), jnp.asarray(w))
        return np.asarray(o), np.asarray(g[0]), np.asarray(g[1])

    monkeypatch.setattr(sparse, "_im2col_mode", lambda s, c, r: "per-tap")
    ref = run()
    for mode in ("win", "win-flat", "win-g"):
        monkeypatch.setattr(sparse, "_im2col_mode", lambda s, c, r, _m=mode: _m)
        got = run()
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-5, atol=1e-5, err_msg=mode)
        np.testing.assert_allclose(got[1], ref[1], rtol=1e-5, atol=1e-5, err_msg=mode)
        np.testing.assert_allclose(got[2], ref[2], rtol=1e-5, atol=1e-4, err_msg=mode)


def test_per_sample_gather_decomposition_agrees(monkeypatch):
    """Batched im2col gathers decompose into per-sample gathers above
    PER_SAMPLE_GATHER_MIN_IDX (a ~2x lowering win at train scale, measured
    scripts/exp_r3_flat_gather.py). Forcing the threshold to 1 must leave
    conv outputs and custom-VJP grads bit-identical to the batched lowering
    for every im2col mode."""
    import jax

    rng = np.random.default_rng(5)
    grid = GridSpec(13, 11, 7)
    b, n_occ, cap = 3, 200, 256
    kk = np.full((b, cap), INVALID_KEY, np.int32)
    feats = np.zeros((b, cap, 6), np.float32)
    for i in range(b):
        keys = np.sort(rng.choice(grid.num_cells, n_occ, replace=False))
        kk[i, :n_occ] = keys.astype(np.int32)
        feats[i, :n_occ] = rng.normal(size=(n_occ, 6)).astype(np.float32)
    w = rng.normal(size=(27, 6, 8)).astype(np.float32) * 0.2
    rb = sparse.build_subm_rulebook_batched(jnp.asarray(kk), grid)

    def run():
        def loss(f, ww):
            o = sparse.sparse_conv_apply_batched(
                jnp.asarray(f), rb, ww, transpose="mirror", win_run=3)
            return jnp.sum(o * o), o

        (_, o), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            jnp.asarray(feats), jnp.asarray(w))
        return np.asarray(o), np.asarray(g[0]), np.asarray(g[1])

    for mode in ("per-tap", "flat", "win", "win-flat", "win-g", "tap-g"):
        monkeypatch.setattr(sparse, "_im2col_mode", lambda s, c, r, _m=mode: _m)
        monkeypatch.setattr(sparse, "PER_SAMPLE_GATHER_MIN_IDX", 10**12)
        ref = run()
        monkeypatch.setattr(sparse, "PER_SAMPLE_GATHER_MIN_IDX", 1)
        got = run()
        for r, g_, what in zip(ref, got, ("out", "dx", "dw")):
            np.testing.assert_allclose(g_, r, rtol=1e-6, atol=1e-6,
                                       err_msg=f"{mode} {what}")


def test_grouped_gather_chunking_matches_reference():
    """gather_rows_windowed_grouped / gather_rows_tap_grouped must agree with
    their ungrouped forms even when the index budget forces MULTIPLE chunks
    (budget < B*N*(K/3)): the chunk boundaries are purely a dispatch choice."""
    rng = np.random.default_rng(5)
    grid = GridSpec(9, 8, 6)
    n_occ, cap = 150, 160
    keys = np.sort(rng.choice(grid.num_cells, n_occ, replace=False)).astype(np.int32)
    kk = np.concatenate([keys, np.full(cap - n_occ, INVALID_KEY, np.int32)])[None]
    feats = jnp.asarray(rng.normal(size=(2, cap, 4)).astype(np.float32))
    rb = sparse.build_subm_rulebook_batched(jnp.asarray(np.repeat(kk, 2, 0)), grid)
    ref_win = sparse.gather_rows_windowed(feats, rb.idx, rb.found)
    ref_tap = sparse.gather_rows_per_tap(feats, rb.idx, rb.found)
    for budget in (1, cap, 2 * cap * 2, 10**9):  # 1 window/op ... all in one
        got_w = sparse.gather_rows_windowed_grouped(feats, rb.idx, rb.found,
                                                    budget=budget)
        np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_win),
                                   atol=1e-6, err_msg=f"win budget={budget}")
        got_t = sparse.gather_rows_tap_grouped(feats, rb.idx, rb.found,
                                               budget=budget)
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_tap),
                                   atol=1e-6, err_msg=f"tap budget={budget}")


def test_branch_books_per_sample_unroll_matches_batched(monkeypatch):
    """build_branch_rulebooks at batch > 1 unrolls into per-sample builds
    above BOOKS_PER_SAMPLE_MIN_VOXELS (a lowering choice only): the unrolled
    books must equal the vmapped batched build leaf-for-leaf."""
    import jax

    from cpd_tpu.models import backbone3d

    rng = np.random.default_rng(11)
    grid = GridSpec(32, 28, 25)
    cap = 512
    kk = []
    for s in range(3):
        n_occ = 300 + 40 * s
        keys = np.sort(rng.choice(grid.num_cells, n_occ, replace=False))
        kk.append(np.concatenate(
            [keys, np.full(cap - n_occ, INVALID_KEY, np.int32)]))
    kk = jnp.asarray(np.stack(kk).astype(np.int32))
    caps = (256, 128, 64, 64)

    batched = backbone3d.build_branch_rulebooks(kk, grid, caps,
                                                with_transpose=True)
    monkeypatch.setattr(backbone3d, "BOOKS_PER_SAMPLE_MIN_VOXELS", 1)
    unrolled = backbone3d.build_branch_rulebooks(kk, grid, caps,
                                                 with_transpose=True)
    assert set(batched) == set(unrolled)
    for name in batched:
        for leaf_b, leaf_u in zip(jax.tree_util.tree_leaves(batched[name]),
                                  jax.tree_util.tree_leaves(unrolled[name])):
            np.testing.assert_array_equal(np.asarray(leaf_b),
                                          np.asarray(leaf_u), err_msg=name)
