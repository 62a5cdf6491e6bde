"""Probe 5: where does backbone time go? Per-layer timings at stage-1 scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_conv_layer.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--v", type=int, default=150_000)
    ap.add_argument("--cin", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import linen as nn

    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY
    from cpd_tpu.models.backbone3d import SubMConvBN, SparseBasicBlock

    V, C = args.v, args.cin
    grid = GridSpec(1504, 1504, 42)
    rng = np.random.default_rng(0)
    n_act = int(V * 0.95)
    keys = np.sort(rng.choice(grid.num_cells, n_act, replace=False).astype(np.int64)).astype(np.int32)
    keys = np.concatenate([keys, np.full(V - n_act, INVALID_KEY, np.int32)])
    keys = jnp.asarray(keys)[None]
    feats = jnp.asarray(rng.normal(size=(1, V, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32) * 0.1)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a); sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)

    rb = jax.jit(lambda k: sparse.build_subm_rulebook_batched(k, grid))(keys)
    rb = jax.tree_util.tree_map(jnp.asarray, rb)

    conv = jax.jit(lambda f, r: sparse.sparse_conv_apply_batched(
        f, r, w, compute_dtype=jnp.bfloat16, transpose="mirror"))
    bench(conv, "bare subm conv (gather+GEMM)", feats, rb)

    layer = SubMConvBN(C)
    lv = layer.init(jax.random.PRNGKey(0), feats, rb, False)
    layer_j = jax.jit(lambda v, f, r: layer.apply(v, f, r, False))
    bench(layer_j, "SubMConvBN eval", lv, feats, rb)

    block = SparseBasicBlock(C)
    bv = block.init(jax.random.PRNGKey(0), feats, rb, False)
    block_j = jax.jit(lambda v, f, r: block.apply(v, f, r, False))
    bench(block_j, "SparseBasicBlock (2 convs)", bv, feats, rb)

    def stage1(v1, v2, v3, f, r):
        x = layer.apply(v1, f, r, False)
        x = block.apply(v2, x, r, False)
        x = block.apply(v3, x, r, False)
        return x
    b2 = block.init(jax.random.PRNGKey(1), feats, rb, False)
    stage_j = jax.jit(stage1)
    bench(stage_j, "stage1 (5 convs: input + 2 blocks)", lv, bv, b2, feats, rb)


if __name__ == "__main__":
    main()
