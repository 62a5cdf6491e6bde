"""Probe 4: cost of each rulebook-building primitive on TPU.

Times, at down2 scale (V=150k inputs, 1.2M candidates, out grid 11.9M cells):
  sort-unique of candidates      (current strided out-set construction)
  cumsum+segment compaction      (proposed dense-occupancy alternative)
  subm inversion scatter         (current negative-tap derivation)
  direct 26-tap LUT lookups      (proposed alternative)
  dense LUT build (memset+scatter), stage-0 and stage-1 sizes

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_rulebook_prims.py
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

    V = 150_016
    NCAND = 8 * V            # 1.2M candidates
    OUT_CELLS = 752 * 752 * 21   # 11.9M
    S0_CELLS = 1504 * 1504 * 41  # 92.7M
    CAP = 80_000
    P = 13

    rng = np.random.default_rng(0)
    cand = jnp.asarray(np.sort(rng.integers(0, OUT_CELLS, NCAND)).astype(np.int32))
    cand_unsorted = jnp.asarray(rng.integers(0, OUT_CELLS, NCAND).astype(np.int32))
    keys = jnp.asarray(np.sort(rng.choice(S0_CELLS, V, replace=False)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, V, (P, V)).astype(np.int32))
    found = jnp.asarray(rng.random((P, V)) < 0.5)

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name):
        try:
            out = fn(); sync(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    @jax.jit
    def sort_unique():
        c = jnp.sort(cand_unsorted)
        first = jnp.concatenate([jnp.array([True]), c[1:] != c[:-1]])
        slot = jnp.cumsum(first.astype(jnp.int32)) - 1
        slot = jnp.where(first & (slot < CAP), slot, CAP)
        out_keys = jax.ops.segment_max(jnp.where(first, c, -1), slot,
                                       num_segments=CAP + 1)[:CAP]
        return out_keys

    @jax.jit
    def dense_compact():
        occ = jnp.zeros((OUT_CELLS,), jnp.int32).at[cand_unsorted].set(1, mode="drop")
        pos = jnp.cumsum(occ) - occ
        rows = jnp.where((occ > 0) & (pos < CAP), pos, CAP)
        iota = jnp.arange(OUT_CELLS, dtype=jnp.int32)
        out_keys = jax.ops.segment_max(jnp.where(occ > 0, iota, -1), rows,
                                       num_segments=CAP + 1)[:CAP]
        return out_keys

    @jax.jit
    def cumsum_only():
        occ = jnp.zeros((OUT_CELLS,), jnp.int32).at[cand_unsorted].set(1, mode="drop")
        return jnp.cumsum(occ)

    @jax.jit
    def inversion_scatter():
        n = V
        arange = jnp.arange(n, dtype=jnp.int32)
        safe_tgt = jnp.where(found, tgt, n)
        idx_neg = jnp.zeros((P, n + 1), jnp.int32).at[
            jnp.arange(P)[:, None], safe_tgt
        ].set(jnp.broadcast_to(arange[None], (P, n)))[:, :n]
        return idx_neg

    @jax.jit
    def direct_26tap():
        lut = jnp.full((S0_CELLS,), -1, jnp.int32).at[keys].set(
            jnp.arange(V, dtype=jnp.int32), mode="drop")
        outs = [lut[jnp.clip(keys + d, 0, S0_CELLS - 1)] for d in range(1, 27)]
        return jnp.stack(outs)

    @jax.jit
    def lut_s0():
        return jnp.full((S0_CELLS,), -1, jnp.int32).at[keys].set(
            jnp.arange(V, dtype=jnp.int32), mode="drop")

    @jax.jit
    def lut_s1():
        return jnp.full((OUT_CELLS,), -1, jnp.int32).at[keys[:80_000] % OUT_CELLS].set(
            jnp.arange(80_000, dtype=jnp.int32), mode="drop")

    bench(sort_unique, "sort-unique 1.2M candidates")
    bench(dense_compact, "dense-occupancy compaction (11.9M)")
    bench(cumsum_only, "scatter+cumsum 11.9M only")
    bench(inversion_scatter, "subm inversion scatter (13, 150k)")
    bench(direct_26tap, "LUT build + 26 direct tap lookups")
    bench(lut_s0, "dense LUT build 92.7M cells")
    bench(lut_s1, "dense LUT build 11.9M cells")


if __name__ == "__main__":
    main()
