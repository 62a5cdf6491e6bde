"""Probe (round 2): Mosaic LANE-axis dynamic gather for the fused conv.

Row gathers (axis 0) are rejected by Mosaic ("Cannot do int indexing on
TPU"). TPU *does* have a lane-shuffle gather primitive (tpu.DynamicGatherOp)
that jnp.take_along_axis(..., axis=-1) can lower to. If the feature table is
kept TRANSPOSED in VMEM -- (C, V): channels on sublanes, voxels on lanes --
an im2col row gather becomes a lane gather:

    g[c, q] = tableT[c, idx_flat[q]]          (C, TILE*K)

Probes, at subm3 scale (V=48k, C=64, K=27, TILE rows/grid step):
  (g1) in-kernel take_along_axis(tableT, idx2d, axis=-1), GEMM after reshape
  (g2) gather only (no GEMM) to isolate the gather cost
  (g3) XLA reference: same lane-gather formulation OUTSIDE pallas

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2i_lane_gather.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--v", type=int, default=48_000)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--k", type=int, default=27)
    ap.add_argument("--tile", type=int, default=256)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, C, K, TILE = args.v, args.c, args.k, args.tile
    N = V  # one output row per input row (subm)
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    tableT = jnp.asarray(rng.normal(size=(C, V)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (N, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K * C, C)).astype(np.float32) * 0.1)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        try:
            out = fn(*a)
            sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:160]}")
            return None
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:44s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms")
        return out

    # (g1) fused lane-gather + GEMM
    def k_g1(idx_ref, t_ref, w_ref, o_ref):
        flat = idx_ref[...].reshape(1, TILE * K)
        i2d = jnp.broadcast_to(flat, (C, TILE * K))
        g = jnp.take_along_axis(t_ref[...], i2d, axis=-1)  # (C, TILE*K)
        g = g.reshape(C, TILE, K).transpose(1, 2, 0).reshape(TILE, K * C)
        o_ref[...] = jnp.dot(g, w_ref[...], preferred_element_type=jnp.float32)

    g1 = pl.pallas_call(
        k_g1,
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, V), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        interpret=interp,
    )
    bench(jax.jit(g1), "pallas lane-gather + GEMM", idx, tableT, w)

    # (g2) gather only
    def k_g2(idx_ref, t_ref, o_ref):
        flat = idx_ref[...].reshape(1, TILE * K)
        i2d = jnp.broadcast_to(flat, (C, TILE * K))
        o_ref[0] = jnp.take_along_axis(t_ref[...], i2d, axis=-1)

    # out block is (C, TILE*K) per step stacked on a leading grid axis
    g2c = pl.pallas_call(
        k_g2,
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, V), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, TILE * K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // TILE, C, TILE * K), jnp.float32),
        interpret=interp,
    )
    bench(jax.jit(g2c), "pallas lane-gather only", idx, tableT)

    # (g3) XLA: same lane formulation, outside pallas
    @jax.jit
    def xla_lane(tT, i):
        i2d = jnp.broadcast_to(i.reshape(-1)[None, :], (C, N * K))
        g = jnp.take_along_axis(tT, i2d, axis=-1)
        return g.reshape(C, N, K)

    bench(xla_lane, "XLA lane-gather (take_along_axis -1)", tableT, idx)


if __name__ == "__main__":
    main()
