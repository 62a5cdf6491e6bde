"""Probe: im2col mode choice IN CONTEXT (4-conv chains on real rulebooks).

The standalone probe (exp_r2j) picked win-flat for c32, but the production
stage-2 chain runs 9.7 ms/conv vs stage-1's 4.7 (win mode) -- re-measure all
modes as 4-conv chains at stage-2/3/4 scale to pick the right table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2l_stage2_modes.py
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

    from cpd_tpu.models.backbone3d import build_branch_rulebooks, stage_grids
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

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    rbs = jax.jit(lambda k: build_branch_rulebooks(k, grid, caps))(keys)
    rbs = jax.tree_util.tree_map(jnp.asarray, rbs)

    def bench(fn, name, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:40s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)

    stages = [
        ("stage1 @120k c16", "subm1", V, 16, 5),
        ("stage2 @80k c32", "subm2", caps[0], 32, 4),
        ("stage3 @48k c64", "subm3", caps[1], 64, 4),
        ("stage4 @24k c128", "subm4", caps[2], 128, 4),
    ]
    dt = jnp.bfloat16
    for label, rbname, v, c, n in stages:
        rb = rbs[rbname]
        x = jnp.asarray(rng.normal(size=(1, v, c)).astype(np.float32)).astype(dt)
        w = jnp.asarray((rng.normal(size=(27, c, c)) * 0.1).astype(np.float32)).astype(dt)
        for mode in ("per-tap", "flat", "win", "win-flat"):
            orig = sparse._im2col_mode
            sparse._im2col_mode = lambda s, cc, r, _m=mode: _m

            def chain(x, idx, found, valid, w):
                y = x
                for _ in range(n):
                    g = sparse._gather_by_mode(y, idx, found, mode)
                    if mode == "per-tap":
                        y = jax.lax.dot_general(
                            g, w, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                            preferred_element_type=dt)
                    else:
                        y = jax.lax.dot_general(
                            g, w, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
                            preferred_element_type=dt)
                    y = jnp.where(valid[..., None], y, 0)
                return y

            try:
                bench(jax.jit(chain), f"{label} {n}x {mode}",
                      x, rb.idx, rb.found, rb.out_valid, w)
            finally:
                sparse._im2col_mode = orig


if __name__ == "__main__":
    main()
