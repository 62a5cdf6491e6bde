"""Probe: why did rulebooks regress 149 -> 165.7 ms after packed lookups?

A/B the lookup forms UNDER VMAP (the model path wraps builders in vmap(B=1),
the earlier probes didn't) and the full subm/strided builders.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2b_rulebooks.py
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

    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.sparse import GridSpec

    rng = np.random.default_rng(0)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        try:
            out = fn(*a); sync(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:56s} {dt*1e3:8.2f} ms", flush=True)
            return out
        except Exception as e:
            print(f"{name:56s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    grid = GridSpec(1504, 1504, 42)
    V = 150_016
    keys1 = np.sort(rng.choice(grid.num_cells, V, replace=False)).astype(np.int32)
    keys = jnp.asarray(keys1)[None]  # (1, V)
    pos_offsets = [(dz, dy, dx) for dz in (0, 1) for dy in (-1, 0, 1)
                   for dx in (-1, 0, 1) if (dz * grid.ny + dy) * grid.nx + dx > 0]

    lutB = sparse.build_dense_lut_batched(keys, grid)
    sync(lutB)
    ok = jnp.ones((1, len(pos_offsets), V), bool)

    def narrow_vmap(l, k, o):
        deltas = jnp.asarray([(dz * grid.ny + dy) * grid.nx + dx
                              for dz, dy, dx in pos_offsets], jnp.int32)
        return jax.vmap(lambda ll, kk, oo: sparse.lookup_dense_rows(
            ll, kk[None, :] + deltas[:, None], oo))(l, k, o)

    def packed_vmap(l, k, o):
        return jax.vmap(lambda ll, kk, oo: sparse.lookup_packed_taps(
            ll, kk, pos_offsets, grid, oo))(l, k, o)

    def packed_flat(l, k, o):
        return sparse.lookup_packed_taps(l[0], k[0], pos_offsets, grid, o[0])

    bench(jax.jit(narrow_vmap), "13-tap narrow lookups, vmap(B=1)", lutB, keys, ok)
    bench(jax.jit(packed_vmap), "13-tap packed lookups, vmap(B=1)", lutB, keys, ok)
    bench(jax.jit(packed_flat), "13-tap packed lookups, no vmap", lutB, keys, ok)

    bench(jax.jit(lambda k: sparse.build_subm_rulebook_batched(k, grid)),
          "build_subm_rulebook_batched s0 (current)", keys)

    g1 = GridSpec(752, 752, 21)
    bench(jax.jit(lambda k: sparse.build_conv_rulebook_batched(
        k, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 80_000)[0]),
          "build_conv_rulebook_batched s0->s1 (current)", keys)

    # stage-1 sizes
    k1 = np.sort(rng.choice(g1.num_cells, 80_000, replace=False)).astype(np.int32)
    k1 = jnp.asarray(k1)[None]
    bench(jax.jit(lambda k: sparse.build_subm_rulebook_batched(k, g1)),
          "build_subm_rulebook_batched s1", k1)


if __name__ == "__main__":
    main()
