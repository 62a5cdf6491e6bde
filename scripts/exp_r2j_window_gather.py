"""Probe (round 2): WINDOWED dx-run feature gathers for the sparse-conv im2col.

The im2col gathers are HBM-transaction-bound (~3.5-6 ns/row regardless of row
width at C<=32, scripts/exp_r2h_gather2.py). The rulebook tap order is
dx-fastest, and for a run of dx-adjacent taps the gather rows are RANKS of
consecutive keys, so max(idx)-min(idx) <= run_len-1 within a run (sortedness
invariant). Fetch ONE (run_len*C)-wide row per run from a shifted-concat
window table instead of run_len narrow rows, then select each tap's block
with 2 vectorized where's -- 3x fewer HBM transactions for 3-runs.

Formulations probed per stage scale (V, C from the backbone ladder):
  (a) per-tap        K gathers of (V,) rows, C wide        [current >1.5M]
  (b) flattened      1 gather of (V*K,) rows, C wide       [current <=1.5M]
  (c) windowed       K/3 gathers of (V,) rows, 3C wide + block select
  (d) windowed-flat  1 gather of (V*K/3,) rows, 3C wide + block select

All include the downstream GEMM so fusion effects are captured.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2j_window_gather.py
"""
import argparse
import time

import numpy as np


def make_stage(rng, v_cap, occ_frac, c, grid_cells):
    n_occ = int(v_cap * occ_frac)
    keys = np.sort(rng.choice(grid_cells, n_occ, replace=False)).astype(np.int32)
    keys = np.concatenate([keys, np.full(v_cap - n_occ, np.iinfo(np.int32).max, np.int32)])
    feats = rng.normal(size=(v_cap, c)).astype(np.float32)
    feats[n_occ:] = 0
    return keys, feats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.ops import sparse
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    dt = jnp.dtype(args.dtype)
    grid = sparse.GridSpec(1504, 1504, 41)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    def timeit(fn, *a):
        o = fn(*a)
        sync(o)
        o = fn(*a)
        sync(o)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = fn(*a)
        sync(o)
        return (time.perf_counter() - t0) / args.iters

    rng = np.random.default_rng(7)
    stages = [
        ("subm1", 120_000, 0.55, 16, 32),
        ("subm2", 80_000, 0.66, 32, 64),
        ("subm3", 48_000, 0.57, 64, 128),
        ("subm4", 24_000, 0.52, 128, 128),
    ]
    k = 27
    for name, v_cap, occ, c, cout in stages:
        keys, feats = make_stage(rng, v_cap, occ, c, grid.num_cells)
        kk = jnp.asarray(keys)[None]
        rb = jax.jit(lambda kx: sparse.build_subm_rulebook_batched(kx, grid))(kk)
        rb = jax.tree_util.tree_map(jnp.asarray, rb)
        f = jnp.asarray(feats.astype(dt))[None]
        w = jnp.asarray(rng.normal(size=(k, c, cout)).astype(dt) * 0.1)

        def conv_per_tap(f, idx, found, w):
            g = sparse.gather_rows_tap_major(f, idx, found)  # (B,K,N,C)
            return jax.lax.dot_general(
                g, w, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                preferred_element_type=dt)

        def conv_flat(f, idx, found, w):
            g = sparse.gather_rows_flat(f, idx, found)  # (B,N,K,C)
            return jax.lax.dot_general(
                g, w, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
                preferred_element_type=dt)

        def windows(f, idx, found, flat):
            b, v, cc = f.shape
            n = idx.shape[1]
            g = k // 3
            shift1 = jnp.pad(f[:, 1:], ((0, 0), (0, 1), (0, 0)))
            shift2 = jnp.pad(f[:, 2:], ((0, 0), (0, 2), (0, 0)))
            wtab = jnp.concatenate([f, shift1, shift2], axis=-1)  # (B,V,3C)
            idx_g = idx.reshape(b, n, g, 3)
            found_g = found.reshape(b, n, g, 3)
            big = jnp.where(found_g, idx_g, jnp.int32(1 << 30))
            base = jnp.min(big, axis=-1)
            base = jnp.where(jnp.any(found_g, -1), base, 0)
            base = jnp.minimum(base, v - 1)  # (b,n,g)
            if flat:
                off = (jnp.arange(b, dtype=base.dtype) * v)[:, None, None]
                wg = wtab.reshape(b * v, 3 * cc)[(base + off).reshape(-1)]
                wins = wg.reshape(b, n, g, 3, cc)
            else:
                cols = [jnp.take_along_axis(wtab, base[:, :, j][..., None], axis=1)
                        for j in range(g)]
                wins = jnp.stack(cols, axis=2).reshape(b, n, g, 3, cc)
            delta = jnp.clip(idx_g - base[..., None], 0, 2)  # (b,n,g,3)
            d = delta[..., None]
            sel = jnp.where(d == 0, wins[:, :, :, 0:1, :],
                            jnp.where(d == 1, wins[:, :, :, 1:2, :],
                                      wins[:, :, :, 2:3, :]))  # (b,n,g,3,c)
            sel = jnp.where(found_g[..., None], sel, 0)
            return sel.reshape(b, n, k, cc)

        def conv_win(f, idx, found, w, flat=False):
            g = windows(f, idx, found, flat)
            return jax.lax.dot_general(
                g, w, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
                preferred_element_type=dt)

        jt = lambda fn: jax.jit(fn)
        fns = [
            ("per-tap", jt(conv_per_tap)),
            ("flattened", jt(conv_flat)),
            ("windowed", jt(lambda f, i, fo, w: conv_win(f, i, fo, w, False))),
            ("windowed-flat", jt(lambda f, i, fo, w: conv_win(f, i, fo, w, True))),
        ]
        ref = None
        for fname, fn in fns:
            o = np.asarray(fn(f, rb.idx, rb.found, w), np.float32)
            if ref is None:
                ref = o
            else:
                err = np.abs(o - ref).max()
                assert err < 0.5, (name, fname, err)
            t = timeit(fn, f, rb.idx, rb.found, w)
            print(f"{name:6s} V={v_cap//1000}k C={c:3d} {fname:14s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
