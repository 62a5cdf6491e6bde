"""Probe: run-packed feature gathers for subm convs.

Hypothesis: XLA row gathers are row-THROUGHPUT bound (~1.9 ns/row measured),
independent of row width up to HBM transaction size, so serving the 3
dx-adjacent taps of each (dz,dy) group from 2 wide gathers of a 4-voxel-packed
(V/4, 4C) table (spans of x-adjacent cells cover <= 3 consecutive sorted rows,
hence <= 2 aligned 4-blocks) beats 3 narrow per-tap gathers: 18 wide rows vs
27 narrow rows per output voxel.

Variants (V=150k, C=16, K=27):
  a) 27 narrow per-tap gathers + mask + GEMM         (production today)
  b) raw 18 wide gathers from (V/4, 64) — no select  (upper bound)
  c) b + 3-bit lane select to 27 taps + mask + GEMM  (the real candidate)
  d) width scaling: 27 narrow gathers at C=64        (row-throughput check)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2d_packed_gather.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--v", type=int, default=150_016)
    ap.add_argument("--c", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    V, C, K = args.v, args.c, 27
    G = K // 3  # (dz,dy) groups
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, V, C)).astype(np.float32)).astype(jnp.bfloat16)
    idx = np.sort(rng.integers(0, V, (1, V, K)).astype(np.int32), axis=1)
    found = rng.random((1, V, K)) < 0.4
    w = jnp.asarray((rng.normal(size=(K, C, C)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)

    # group structure: tap g*3+j targets rows base_g + lane_j, lane in 0..5
    # (simulate: base = min over the 3 taps' rows, lanes = row - 4*(base//4))
    idx3 = idx.reshape(1, V, G, 3)
    base = idx3.min(axis=3)                       # (1, V, G)
    blk = (base // 4).astype(np.int32)            # aligned block id
    lane = (np.minimum(idx3 - (blk * 4)[..., None], 7)).astype(np.int32)  # 0..7
    j_idx = jnp.asarray(idx)
    j_found = jnp.asarray(found)
    j_blk = jnp.asarray(blk)
    j_lane = jnp.asarray(lane)

    # packed table: (V/4 + 1, 4C); +1 pad block for windows off the end
    VB = V // 4 + 1
    packed = jnp.pad(feats, ((0, 0), (0, 4), (0, 0))).reshape(1, VB, 4 * C)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a); sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:52s} {(time.perf_counter() - t0) / args.iters * 1e3:8.2f} ms",
              flush=True)

    def conv_narrow(x):
        cols = [jnp.take_along_axis(x, j_idx[:, :, t][..., None], axis=1) for t in range(K)]
        g = jnp.stack(cols, axis=1)
        g = jnp.where(jnp.swapaxes(j_found, 1, 2)[..., None], g, 0)
        return jax.lax.dot_general(g, w, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    def wide_raw(p):
        outs = []
        for gi in range(G):
            r0 = jnp.take_along_axis(p, j_blk[:, :, gi][..., None], axis=1)
            r1 = jnp.take_along_axis(p, (j_blk[:, :, gi] + 1)[..., None], axis=1)
            outs.append(r0 + r1)
        return sum(outs)

    def conv_packed(x, p):
        del x
        taps = []
        for gi in range(G):
            r0 = jnp.take_along_axis(p, j_blk[:, :, gi][..., None], axis=1)  # (1,V,4C)
            r1 = jnp.take_along_axis(p, (j_blk[:, :, gi] + 1)[..., None], axis=1)
            win = jnp.concatenate([r0, r1], axis=-1).reshape(1, V, 8, C)
            for j in range(3):
                ln = j_lane[:, :, gi, j]  # (1,V) in 0..7
                # 3-level bit select over the 8 lanes
                w4 = jnp.where((ln[..., None, None] & 4).astype(bool), win[:, :, 4:], win[:, :, :4])
                w2 = jnp.where((ln[..., None, None] & 2).astype(bool), w4[:, :, 2:], w4[:, :, :2])
                w1 = jnp.where((ln[..., None] & 1).astype(bool), w2[:, :, 1], w2[:, :, 0])
                taps.append(w1)  # (1,V,C)
        g = jnp.stack(taps, axis=1)  # (1,K,V,C)
        g = jnp.where(jnp.swapaxes(j_found, 1, 2)[..., None], g, 0)
        return jax.lax.dot_general(g, w, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    j = jax.jit
    bench(j(conv_narrow), "a) 27 narrow gathers + mask + GEMM", feats)
    bench(j(wide_raw), "b) 18 wide gathers, no select (bound)", packed)
    bench(j(conv_packed), "c) 18 wide + lane-select + mask + GEMM", feats, packed)

    C2 = 64
    feats64 = jnp.asarray(rng.normal(size=(1, V, C2)).astype(np.float32)).astype(jnp.bfloat16)

    def narrow64(x):
        cols = [jnp.take_along_axis(x, j_idx[:, :, t][..., None], axis=1) for t in range(K)]
        return sum(cols)

    bench(j(narrow64), "d) 27 narrow gathers at C=64 (no GEMM)", feats64)

    def narrow16(x):
        cols = [jnp.take_along_axis(x, j_idx[:, :, t][..., None], axis=1) for t in range(K)]
        return sum(cols)

    bench(j(narrow16), "e) 27 narrow gathers at C=16 (no GEMM)", feats)


if __name__ == "__main__":
    main()
