"""Probe 2: Mosaic same-shape gather (take_along_axis) for per-tap conv gathers.

Tests, small-to-large:
  A. Pallas kernel: per-tap take_along_axis(table (V,C), idx (V,C), axis=0)
     x K taps, accumulating K GEMMs -- the subm-conv formulation.
  B. XLA row-cost hypothesis: gather (V*K) rows from (V,16) vs (V,128) table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_tal_gather.py [--v 150016]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--v", type=int, default=150_016)
    ap.add_argument("--cin", type=int, default=16)
    ap.add_argument("--cout", type=int, default=16)
    ap.add_argument("--k", type=int, default=27)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, K, CIN, COUT = args.v, args.k, args.cin, args.cout
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, CIN)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (V, K)).astype(np.int32))
    found = jnp.asarray(rng.random((V, K)) < 0.4)
    w = jnp.asarray(rng.normal(size=(K, CIN, COUT)).astype(np.float32) * 0.1)

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name, ref=None):
        try:
            out = fn(); sync(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            err = "" if ref is None else f"  maxdiff={float(jnp.abs(out - ref).max()):.2e}"
            print(f"{name:34s} {dt*1e3:8.2f} ms{err}", flush=True)
            return out
        except Exception as e:
            print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
            return None

    tbf = table.astype(jnp.bfloat16)
    wbf = w.astype(jnp.bfloat16)

    @jax.jit
    def conv_xla():
        g = tbf[idx.reshape(-1)].reshape(V, K, CIN)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(g.reshape(V, K * CIN),
                                   wbf.reshape(K * CIN, COUT),
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    ref = bench(conv_xla, "XLA bf16 gather+GEMM (baseline)")

    # A. Pallas per-tap same-shape gather, full arrays in VMEM
    def kernel(idx_ref, found_ref, table_ref, w_ref, out_ref):
        acc = jnp.zeros((V, COUT), jnp.float32)
        t = table_ref[:]
        for k in range(K):
            ik = jax.lax.broadcast_in_dim(idx_ref[:, k], (V, CIN), (0,))
            g = jnp.take_along_axis(t, ik, axis=0)          # same-shape gather
            g = jnp.where(found_ref[:, k][:, None], g, 0)
            acc = acc + jnp.dot(g, w_ref[k],
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    try:
        fused = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, COUT), jnp.float32),
            interpret=args.cpu,
        )
        fused_j = jax.jit(lambda: fused(idx, found, tbf, wbf))
        bench(fused_j, "Pallas per-tap tal gather (K GEMMs)", ref)
    except Exception as e:
        print(f"pallas build FAILED: {type(e).__name__}: {str(e)[:300]}")

    # B. XLA row-cost: same number of gathered ROWS, wider channels
    wide = jnp.asarray(rng.normal(size=(V, 128)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def g16():
        return tbf[idx.reshape(-1)]

    @jax.jit
    def g128():
        return wide[idx.reshape(-1)]

    bench(g16, "XLA gather rows from (V,16)")
    bench(g128, "XLA gather rows from (V,128)")


if __name__ == "__main__":
    main()
