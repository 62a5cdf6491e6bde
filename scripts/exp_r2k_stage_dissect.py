"""Probe (round 2): per-stage production costs after windowed gathers +
single-fetch bitmap LUTs.

Times, on beam-structured lidar keys at the audited caps:
  - each rulebook sub-builder (bitmap LUT build, subm, strided) per stage
  - each backbone stage chain (the real flax modules, eval mode) given its
    prebuilt rulebooks

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2k_stage_dissect.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import (VoxelResBackBone8x,
                                           build_branch_rulebooks, stage_grids)
    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    rng = np.random.default_rng(0)
    grid = GridSpec(1504, 1504, 41)
    V = 120_000
    pts, _ = make_lidar_frame(rng, 200_000)
    ijk = np.floor((pts[:, :3] + np.array([75.2, 75.2, 2.0])) /
                   np.array([0.1, 0.1, 0.15])).astype(np.int64)
    okm = ((ijk >= 0).all(1) & (ijk[:, 0] < grid.nx) & (ijk[:, 1] < grid.ny)
           & (ijk[:, 2] < grid.nz))
    key = np.unique(((ijk[okm, 2] * grid.ny + ijk[okm, 1]) * grid.nx
                     + ijk[okm, 0]).astype(np.int32))[:V]
    kk = np.full(V, INVALID_KEY, np.int32)
    kk[:key.shape[0]] = key
    keys = jnp.asarray(kk)[None]
    caps = (80_000, 48_000, 24_000, 20_000)
    g = stage_grids(grid)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:46s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    j = jax.jit

    # ---- rulebook sub-builders (the production bitmap path) ----------------
    bench(j(lambda k: build_branch_rulebooks(k, grid, caps)),
          "TOTAL rulebooks (eval)", keys)
    lut0 = bench(j(lambda k: sparse.build_bitmap_lut_batched(k, g["x_conv1"])),
                 "  lut0 bitmap build (92.7M cells)", keys)
    bench(j(lambda k, l: sparse.build_subm_rulebook_batched(k, g["x_conv1"], lut=l)),
          "  subm1 (26-tap lookups @120k)", keys, lut0)
    rb_d2 = bench(j(lambda k, l: sparse.build_conv_rulebook_batched(
        k, g["x_conv1"], (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[0], lut=l)[0]),
        "  down2 (sort+27-tap lookups)", keys, lut0)
    k1 = rb_d2.out_keys
    lut1 = bench(j(lambda k: sparse.build_bitmap_lut_batched(k, g["x_conv2"])),
                 "  lut1 bitmap build (11.6M cells)", k1)
    bench(j(lambda k, l: sparse.build_subm_rulebook_batched(k, g["x_conv2"], lut=l)),
          "  subm2 (@80k)", k1, lut1)
    rb_d3 = bench(j(lambda k, l: sparse.build_conv_rulebook_batched(
        k, g["x_conv2"], (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[1], lut=l)[0]),
        "  down3", k1, lut1)
    k2 = rb_d3.out_keys
    lut2 = bench(j(lambda k: sparse.build_bitmap_lut_batched(k, g["x_conv3"])),
                 "  lut2 bitmap build", k2)
    bench(j(lambda k, l: sparse.build_subm_rulebook_batched(k, g["x_conv3"], lut=l)),
          "  subm3 (@48k)", k2, lut2)
    rb_d4 = bench(j(lambda k, l: sparse.build_conv_rulebook_batched(
        k, g["x_conv3"], (3, 3, 3), (2, 2, 2), (1, 1, 0), caps[2], lut=l)[0]),
        "  down4", k2, lut2)
    k3 = rb_d4.out_keys
    lut3 = bench(j(lambda k: sparse.build_bitmap_lut_batched(k, g["x_conv4"])),
                 "  lut3 bitmap build", k3)
    bench(j(lambda k, l: sparse.build_subm_rulebook_batched(k, g["x_conv4"], lut=l)),
          "  subm4 (@24k)", k3, lut3)
    bench(j(lambda k, l: sparse.build_conv_rulebook_batched(
        k, g["x_conv4"], (1, 1, 3), (1, 1, 2), (0, 0, 0), caps[3], lut=l)[0]),
        "  conv_out", k3, lut3)

    # ---- backbone stage chains (real modules, eval) -------------------------
    model = VoxelResBackBone8x(grid=grid, caps=caps)
    feats = jnp.asarray(rng.normal(size=(1, V, 5)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), feats, keys, False)
    full = j(lambda f, k: model.apply(variables, f, k, False))
    out = bench(full, "TOTAL backbone (incl rulebooks)", feats, keys)

    # isolate: backbone with prebuilt rulebooks is not exposed; instead time
    # conv chains per stage as standalone jits on the real rulebooks
    rbs = j(lambda k: build_branch_rulebooks(k, grid, caps))(keys)
    rbs = jax.tree_util.tree_map(jnp.asarray, rbs)

    def subm_chain(n_convs, cin, cout, v):
        w1 = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * .1)
        w = jnp.asarray(rng.normal(size=(27, cout, cout)).astype(np.float32) * .1)

        def f(x, rb):
            y = sparse.sparse_conv_apply_batched(
                x, rb, w1, compute_dtype=jnp.bfloat16,
                out_dtype=jnp.bfloat16, win_run=3)
            for _ in range(n_convs - 1):
                y = sparse.sparse_conv_apply_batched(
                    y, rb, w, compute_dtype=jnp.bfloat16,
                    out_dtype=jnp.bfloat16, win_run=3)
            return y
        return j(f)

    x0 = jnp.asarray(rng.normal(size=(1, V, 5)).astype(np.float32))
    bench(subm_chain(5, 5, 16, V), "  stage1: 5 subm convs @120k c16",
          x0, rbs["subm1"])
    x1 = jnp.asarray(rng.normal(size=(1, caps[0], 16)).astype(np.float32))
    bench(subm_chain(4, 16, 32, caps[0]), "  stage2: 4 subm convs @80k c32",
          x1, rbs["subm2"])
    x2 = jnp.asarray(rng.normal(size=(1, caps[1], 32)).astype(np.float32))
    bench(subm_chain(4, 32, 64, caps[1]), "  stage3: 4 subm convs @48k c64",
          x2, rbs["subm3"])
    x3 = jnp.asarray(rng.normal(size=(1, caps[2], 64)).astype(np.float32))
    bench(subm_chain(4, 64, 128, caps[2]), "  stage4: 4 subm convs @24k c128",
          x3, rbs["subm4"])

    def strided(cin, cout, name, rbname, xin):
        w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * .1)
        bench(j(lambda x, rb: sparse.sparse_conv_apply_batched(
            x, rb, w, compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16,
            win_run=3)), name, xin, rbs[rbname])

    strided(16, 32, "  down2 conv @120k->80k", "down2",
            jnp.asarray(rng.normal(size=(1, V, 16)).astype(np.float32)))
    strided(32, 64, "  down3 conv", "down3",
            jnp.asarray(rng.normal(size=(1, caps[0], 32)).astype(np.float32)))
    strided(64, 128, "  down4 conv", "down4",
            jnp.asarray(rng.normal(size=(1, caps[1], 64)).astype(np.float32)))


if __name__ == "__main__":
    main()
