"""Pallas fused gather-GEMM kernels vs jnp oracles (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from cpd_tpu.ops import pallas_conv


def _setup(seed=0, B=2, V=1000, N=700, K=27, CIN=16, COUT=32):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(B, V, CIN)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, N, K)).astype(np.int32))
    found = jnp.asarray(rng.random((B, N, K)) < 0.4)
    w = jnp.asarray(rng.normal(size=(K * CIN, COUT)).astype(np.float32) * 0.1)
    g = jnp.take_along_axis(table, idx.reshape(B, N * K)[..., None], axis=1)
    g = jnp.where(found[..., None], g.reshape(B, N, K, CIN), 0)
    return table, idx, found, w, g, rng


def test_gather_gemm_matches_oracle():
    table, idx, found, w, g, _ = _setup()
    K, CIN, COUT = 27, 16, 32
    out = pallas_conv.gather_gemm(table, idx, found, w, compute_dtype=jnp.float32)
    ref = jnp.einsum("bnkc,kcd->bnd", g, w.reshape(K, CIN, COUT))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gather_gemm_dw_matches_oracle():
    table, idx, found, w, g, rng = _setup()
    B, N, COUT = 2, 700, 32
    gy = jnp.asarray(rng.normal(size=(B, N, COUT)).astype(np.float32))
    dw = pallas_conv.gather_gemm_dw(table, idx, found, gy, compute_dtype=jnp.float32)
    dw_ref = jnp.einsum("bnkc,bnd->kcd", g, gy).reshape(27 * 16, COUT)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=1e-4, atol=1e-4)


def test_gather_gemm_row_padding():
    # N not a multiple of the tile: padded rows must not contribute
    table, idx, found, w, g, _ = _setup(N=130)
    out = pallas_conv.gather_gemm(table, idx, found, w, compute_dtype=jnp.float32)
    assert out.shape == (2, 130, 32)
    ref = jnp.einsum("bnkc,kcd->bnd", g, w.reshape(27, 16, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
