"""Probe: does a LEADING BATCH DIM OF 1 slow the im2col gathers?

The batched-gather lowering penalty is ~2x at batch 4 (exp_r3_flat_gather,
exp_r4_books). The production batch-1 path still carries a leading dim of 1
through every gather ((1, V, C) tables, (1, N) indices). If XLA lowers the
squeezed 2-D form faster, every inference gather gets it for free.

Variants (4-conv chains, stage shapes from real-frame rulebooks):
  b1 (current)  -- (1, V, C) batched gather path as shipped
  b1 squeezed   -- identical math on (V, C)/(N,) operands, no leading dim

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r4_squeeze.py
"""
import argparse
import time
from functools import partial

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chain", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import build_branch_rulebooks
    from cpd_tpu.models.detector import keys_from_frame
    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize_batch
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    rng = np.random.default_rng(0)
    spec = VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                (0.1, 0.1, 0.15), 90_000)
    grid = sparse.GridSpec(spec.grid_size[0], spec.grid_size[1],
                           spec.grid_size[2] + 1)
    pts = jnp.asarray(np.stack([make_lidar_frame(rng, 200_000)[0]]))
    frame = voxelize_batch(pts, spec, jnp.ones((1, 200_000), bool))
    keys = keys_from_frame(frame, grid)
    caps = (80_000, 48_000, 24_000, 20_000)
    rbs = jax.jit(lambda k: build_branch_rulebooks(k, grid, caps))(keys)
    rbs = jax.tree_util.tree_map(jnp.asarray, rbs)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a)
        sync(out)
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:40s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    def win_squeezed(features, idx, found):
        """gather_rows_windowed on squeezed (V, C)/(N, K) operands."""
        v, c = features.shape
        n, k = idx.shape
        g = k // 3
        shift1 = jnp.pad(features[1:], ((0, 1), (0, 0)))
        shift2 = jnp.pad(features[2:], ((0, 2), (0, 0)))
        wtab = jnp.concatenate([features, shift1, shift2], axis=-1)  # (V, 3C)
        idx_g = idx.reshape(n, g, 3)
        found_g = found.reshape(n, g, 3)
        big = jnp.where(found_g, idx_g, jnp.int32(1 << 30))
        base = jnp.min(big, axis=-1)
        base = jnp.where(jnp.any(found_g, -1), base, 0)
        base = jnp.minimum(base, v - 1)
        cols = [wtab[base[:, j]] for j in range(g)]
        wins = jnp.stack(cols, axis=1).reshape(n, g, 3, c)
        d = jnp.clip(idx_g - base[..., None], 0, 2)[..., None]
        sel = jnp.where(d == 0, wins[:, :, 0:1, :],
                        jnp.where(d == 1, wins[:, :, 1:2, :],
                                  wins[:, :, 2:3, :]))
        sel = jnp.where(found_g[..., None], sel, 0)
        return sel.reshape(n, k, c)

    dt = jnp.bfloat16
    stages = [
        ("stage1 c16", "subm1", 90_000, 16),
        ("stage2 c32", "subm2", caps[0], 32),
        ("stage3 c64", "subm3", caps[1], 64),
    ]
    for label, rbname, v, c in stages:
        rb = rbs[rbname]
        x = jnp.asarray(rng.normal(size=(1, v, c)).astype(np.float32)).astype(dt)
        w = jnp.asarray((rng.normal(size=(27, c, c)) * 0.1).astype(np.float32)).astype(dt)

        def chain_b1(x, idx, found, valid, w):
            y = x
            for _ in range(args.chain):
                g = sparse.gather_rows_windowed(y, idx, found)
                y = jax.lax.dot_general(
                    g, w, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
                    preferred_element_type=dt)
                y = jnp.where(valid[..., None], y, 0)
            return y

        def chain_sq(x, idx, found, valid, w):
            y = x[0]
            for _ in range(args.chain):
                g = win_squeezed(y, idx[0], found[0])
                y = jax.lax.dot_general(
                    g, w, dimension_numbers=(((1, 2), (0, 1)), ((), ())),
                    preferred_element_type=dt)
                y = jnp.where(valid[0][..., None], y, 0)
            return y[None]

        ref = bench(jax.jit(chain_b1), f"{label} b1 (current)",
                    x, rb.idx, rb.found, rb.out_valid, w)
        got = bench(jax.jit(chain_sq), f"{label} b1 squeezed",
                    x, rb.idx, rb.found, rb.out_valid, w)
        err = float(np.max(np.abs(np.asarray(got, np.float32)
                                  - np.asarray(ref, np.float32))))
        if err > 1e-2:
            print(f"  !! squeezed mismatch {err}")

        # squeezed MODE sweep: which 2-D im2col form wins per stage?
        def chain_mode(x, idx, found, valid, w, mode):
            y = x[0]
            for _ in range(args.chain):
                g = sparse._gather_by_mode_2d(y, idx[0], found[0], mode)
                if mode == "per-tap":  # (K, N, C)
                    y = jax.lax.dot_general(
                        g, w, dimension_numbers=(((0, 2), (0, 1)), ((), ())),
                        preferred_element_type=dt)
                else:
                    y = jax.lax.dot_general(
                        g, w, dimension_numbers=(((1, 2), (0, 1)), ((), ())),
                        preferred_element_type=dt)
                y = jnp.where(valid[0][..., None], y, 0)
            return y[None]

        for mode in ("win-flat", "flat", "tap-g", "per-tap"):
            got = bench(jax.jit(partial(chain_mode, mode=mode)),
                        f"{label} sq {mode}",
                        x, rb.idx, rb.found, rb.out_valid, w)
            err = float(np.max(np.abs(np.asarray(got, np.float32)
                                      - np.asarray(ref, np.float32))))
            if err > 1e-2:
                print(f"  !! sq {mode} mismatch {err}")


if __name__ == "__main__":
    main()
