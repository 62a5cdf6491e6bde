"""Probe: which gather formulation is fastest on TPU for the im2col path.

Variants at stage-1 scale (V=150k, K=27, C=16):
  a) f32 gather + GEMM              (element-rate baseline)
  b) bf16 gather + GEMM             (half bytes, same elements)
  c) packed-int32 gather (2 bf16 channels per element) + bitcast + GEMM
  d) Pallas kernel with jnp.take    (does Mosaic lower it?)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_gather_variants.py
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
    w = jnp.asarray(rng.normal(size=(K * CIN, COUT)).astype(np.float32) * 0.1)

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
            print(f"{name:28s} {dt*1e3:8.2f} ms{err}")
            return out, dt
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None, None

    @jax.jit
    def conv_f32():
        g = table[idx.reshape(-1)].reshape(V, K, CIN)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(g.reshape(V, K * CIN), w,
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    tbf = table.astype(jnp.bfloat16)
    wbf = w.astype(jnp.bfloat16)

    @jax.jit
    def conv_bf16():
        g = tbf[idx.reshape(-1)].reshape(V, K, CIN)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(g.reshape(V, K * CIN), wbf,
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # packed: (V, CIN) bf16 -> (V, CIN//2) int32
    tpacked = jax.lax.bitcast_convert_type(
        tbf.reshape(V, CIN // 2, 2), jnp.int32).reshape(V, CIN // 2)

    @jax.jit
    def conv_packed():
        gp = tpacked[idx.reshape(-1)]                       # (V*K, CIN//2) int32
        g = jax.lax.bitcast_convert_type(gp, jnp.bfloat16)  # (V*K, CIN//2, 2)
        g = g.reshape(V, K, CIN)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(g.reshape(V, K * CIN), wbf,
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    ref, dt_a = bench(conv_f32, "XLA f32 gather+GEMM")
    bench(conv_bf16, "XLA bf16 gather+GEMM", ref)
    bench(conv_packed, "XLA packed-int32 gather", ref)

    # Pallas jnp.take variant
    TILE = 256
    def kernel(idx_ref, found_ref, table_ref, w_ref, out_ref):
        idxs = idx_ref[:]
        g = jnp.take(table_ref[:], idxs.reshape(-1), axis=0)
        g = g.reshape(TILE, K, CIN)
        g = jnp.where(found_ref[:][..., None], g, 0.0)
        out_ref[:] = jnp.dot(g.reshape(TILE, K * CIN), w_ref[:],
                             preferred_element_type=jnp.float32)

    fused = pl.pallas_call(
        kernel,
        grid=(V // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, CIN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * CIN, COUT), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, COUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, COUT), jnp.float32),
        interpret=args.cpu,
    )
    Vt = (V // TILE) * TILE
    fused_j = jax.jit(lambda: fused(idx[:Vt], found[:Vt], tbf, wbf))
    bench(fused_j, "Pallas jnp.take fused", ref[:Vt] if ref is not None else None)


if __name__ == "__main__":
    main()
