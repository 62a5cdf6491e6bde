"""Experiment: Pallas fused gather-GEMM for the sparse-conv im2col path.

Compares, at stage-1 scale (V=150k voxels, C=16, K=27 taps):
  (a) XLA baseline: take_along_axis gather + one big GEMM (current sparse.py)
  (b) Pallas fused kernel: feature table resident in VMEM, per-tile row
      gather + MXU GEMM, no HBM im2col materialization.

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_pallas_gather.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--v", type=int, default=150_000)
    ap.add_argument("--cin", type=int, default=16)
    ap.add_argument("--cout", type=int, default=16)
    ap.add_argument("--k", type=int, default=27)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, K, CIN, COUT, TILE = args.v, args.k, args.cin, args.cout, args.tile
    # pad V to a tile multiple
    Vp = ((V + TILE - 1) // TILE) * TILE
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(Vp, CIN)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (Vp, K)).astype(np.int32))
    found = jnp.asarray(rng.random((Vp, K)) < 0.4)
    w = jnp.asarray(rng.normal(size=(K * CIN, COUT)).astype(np.float32) * 0.1)

    def sync(x):
        np.asarray(x.ravel()[0])

    # ---------------- (a) XLA baseline ----------------
    @jax.jit
    def xla_conv(table, idx, found, w):
        t = table.astype(jnp.bfloat16)
        g = t[idx.reshape(-1)].reshape(Vp, K, CIN)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(
            g.reshape(Vp, K * CIN), w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_a = xla_conv(table, idx, found, w); sync(out_a)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out_a = xla_conv(table, idx, found, w)
    sync(out_a)
    dt_a = (time.perf_counter() - t0) / args.iters
    print(f"XLA gather+GEMM: {dt_a*1e3:.2f} ms")

    # ---------------- (b) Pallas fused ----------------
    def kernel(idx_ref, found_ref, table_ref, w_ref, out_ref):
        # idx_ref: (TILE, K) int32; table_ref: (Vp, CIN) resident; w_ref: (K*CIN, COUT)
        idxs = idx_ref[:]                        # (TILE, K)
        g = table_ref[idxs.reshape(-1), :]       # fancy row gather -> (TILE*K, CIN)
        g = g.reshape(TILE, K, CIN)
        g = jnp.where(found_ref[:][..., None], g, 0.0)
        out_ref[:] = jnp.dot(
            g.reshape(TILE, K * CIN).astype(jnp.bfloat16),
            w_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    grid = (Vp // TILE,)
    try:
        fused = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Vp, CIN), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K * CIN, COUT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, COUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Vp, COUT), jnp.float32),
            interpret=args.cpu,
        )
        fused_j = jax.jit(lambda t, i, f, ww: fused(i, f, t, ww))
        out_b = fused_j(table, idx, found, w); sync(out_b)
        err = float(jnp.max(jnp.abs(out_a - out_b)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out_b = fused_j(table, idx, found, w)
        sync(out_b)
        dt_b = (time.perf_counter() - t0) / args.iters
        print(f"Pallas fused:    {dt_b*1e3:.2f} ms   maxdiff={err:.2e}  speedup={dt_a/dt_b:.2f}x")
    except Exception as e:
        print(f"Pallas fused FAILED: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
