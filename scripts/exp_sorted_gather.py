"""Probe 3: does gather locality (sorted indices) change TPU gather speed?

The rulebook's per-tap index columns are monotone nondecreasing (constant key
delta of a sorted key array), so an im2col built as K per-tap gathers has
near-sequential access, while the row-major (V, K) flattened gather
interleaves 27 streams.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_sorted_gather.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--v", type=int, default=150_016)
    ap.add_argument("--cin", type=int, default=16)
    ap.add_argument("--k", type=int, default=27)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    V, K, CIN = args.v, args.k, args.cin
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, CIN)).astype(np.float32)).astype(jnp.bfloat16)
    idx_rand = rng.integers(0, V, (V, K)).astype(np.int32)
    # per-tap monotone indices: sorted within each column (the rulebook shape)
    idx_sorted = np.sort(idx_rand, axis=0)
    j_rand = jnp.asarray(idx_rand)
    j_sorted = jnp.asarray(idx_sorted)

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name):
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)

    @jax.jit
    def flat_rand():
        return table[j_rand.reshape(-1)]

    @jax.jit
    def flat_sorted():  # column-major flatten: per-tap streams in sequence
        return table[j_sorted.T.reshape(-1)]

    @jax.jit
    def pertap_rand():
        return jnp.stack([table[j_rand[:, k]] for k in range(K)], axis=1)

    @jax.jit
    def pertap_sorted():
        return jnp.stack([table[j_sorted[:, k]] for k in range(K)], axis=1)

    @jax.jit
    def quarter_rows():  # scaling check: V*K/4 rows
        return table[j_rand[: V // 4].reshape(-1)]

    @jax.jit
    def iota_gather():  # perfectly sequential indices: upper bound
        seq = jnp.tile(jnp.arange(V, dtype=jnp.int32), K)
        return table[seq]

    bench(flat_rand, "flat (V*K) random")
    bench(flat_sorted, "flat (V*K) per-tap-sorted column-major")
    bench(pertap_rand, "27 per-tap gathers, random")
    bench(pertap_sorted, "27 per-tap gathers, monotone")
    bench(quarter_rows, "flat (V*K/4) random (scaling check)")
    bench(iota_gather, "flat (V*K) iota (sequential bound)")


if __name__ == "__main__":
    main()
