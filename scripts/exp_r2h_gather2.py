"""Probe (round 2): im2col gather strategy at the NEW audited stage scales.

With caps (80k, 48k, 24k, 20k) the deep stages fall under XLA's ~2M-index
flattened-gather fast path (48k*27 = 1.3M, 24k*27 = 0.65M), so a single
flattened (N*K,) gather may now beat K per-tap (N,)-row gathers there
(fewer latency-bound dispatches). Stage-0 (120k*27 = 3.2M) stays per-tap.

Also probes Mosaic lowering of in-kernel gathers for the fused Pallas conv:
  (p1) fancy int row indexing           table[idx]           (known rejected)
  (p2) take_along_axis, broadcast idx   take_along_axis(t, i2d, 0)
  (p3) lane-transposed dynamic gather   take_along_axis(tT, i, -1)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2h_gather2.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-pallas", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:52s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    # gather + GEMM at each stage scale (N rows, K taps, C channels)
    stages = [
        ("subm1 120k x27 c16", 120_000, 27, 16),
        ("subm2  80k x27 c32", 80_000, 27, 32),
        ("subm3  48k x27 c64", 48_000, 27, 64),
        ("subm4  24k x27 c128", 24_000, 27, 128),
    ]
    for name, n, k, c in stages:
        table = jnp.asarray(rng.normal(size=(1, n, c)).astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, n, (1, n, k)).astype(np.int32))
        found = jnp.asarray(rng.random((1, n, k)) < 0.6)
        w = jnp.asarray(rng.normal(size=(k, c, c)).astype(np.float32) * 0.1).astype(jnp.bfloat16)

        @jax.jit
        def per_tap(t, i, f, w):
            cols = [jnp.take_along_axis(t, i[:, :, tt][..., None], axis=1)
                    for tt in range(k)]
            g = jnp.stack(cols, axis=1)
            g = jnp.where(jnp.swapaxes(f, 1, 2)[..., None], g, 0)
            return jax.lax.dot_general(
                g, w, (((1, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)

        @jax.jit
        def flat(t, i, f, w):
            b, nn, cc = t.shape
            g = t.reshape(b * nn, cc)[i.reshape(-1)].reshape(b, nn, k, cc)
            g = jnp.where(f[..., None], g, 0)
            # (B, N, K, C) x (K, C, Cout)
            return jax.lax.dot_general(
                g, w, (((2, 3), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32)

        bench(per_tap, f"{name} per-tap", table, idx, found, w)
        bench(flat, f"{name} flattened", table, idx, found, w)

    if args.skip_pallas:
        return

    # ---- Mosaic in-kernel gather probes (TILE rows x K taps x C) ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE, K, C, V = 256, 27, 32, 48_000
    interp = jax.default_backend() != "tpu"
    table = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (V, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K * C, C)).astype(np.float32) * 0.1)

    def make(kernel_body, name):
        f = pl.pallas_call(
            kernel_body,
            grid=(V // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((V, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K * C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, C), jnp.float32),
            interpret=interp,
        )
        try:
            out = bench(jax.jit(f), name, idx, table, w)
            print(f"  {name}: ok, sum={float(np.asarray(out).sum()):.1f}")
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    def k_fancy(idx_ref, t_ref, w_ref, o_ref):
        g = t_ref[idx_ref[...].reshape(-1), :]
        o_ref[...] = jnp.dot(g.reshape(TILE, K * C), w_ref[...],
                             preferred_element_type=jnp.float32)

    def k_tala0(idx_ref, t_ref, w_ref, o_ref):
        i2d = jnp.broadcast_to(idx_ref[...].reshape(-1)[:, None], (TILE * K, C))
        g = jnp.take_along_axis(t_ref[...], i2d, axis=0)
        o_ref[...] = jnp.dot(g.reshape(TILE, K * C), w_ref[...],
                             preferred_element_type=jnp.float32)

    make(k_fancy, "pallas fancy-index row gather")
    make(k_tala0, "pallas take_along_axis axis0")


if __name__ == "__main__":
    main()
