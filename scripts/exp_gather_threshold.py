"""Probe 10: XLA gather fast-path size threshold on TPU.

flat (600k) was fast, flat (4M) slow. Find the cliff, for both feature-row
gathers ((V,16) bf16 table) and LUT gathers ((92.7M,) int32 table).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_gather_threshold.py
"""
import time

import numpy as np


def main():
    import jax, jax.numpy as jnp

    V = 150_016
    CELLS = 92_700_000
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, 16)).astype(np.float32)).astype(jnp.bfloat16)
    lut = jnp.asarray(rng.integers(-1, V, (CELLS,)).astype(np.int32))

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name):
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        sync(out)
        print(f"{name:40s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms", flush=True)

    for n in (500_000, 1_000_000, 1_500_000, 2_000_000, 3_000_000, 4_000_000):
        idx = jnp.asarray(rng.integers(0, V, (n,)).astype(np.int32))
        bench(jax.jit(lambda idx=idx: table[idx]), f"feature rows, {n/1e6:.1f}M indices")

    for n in (500_000, 1_000_000, 2_000_000, 4_000_000):
        qi = jnp.asarray(rng.integers(0, CELLS, (n,)).astype(np.int32))
        bench(jax.jit(lambda qi=qi: lut[qi]), f"LUT cells,    {n/1e6:.1f}M indices")


if __name__ == "__main__":
    main()
