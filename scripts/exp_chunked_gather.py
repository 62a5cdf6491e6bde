"""Probe 12: chunked column-major gathers vs 27 per-tap gathers for im2col.

Groups taps so each gather has <= 2M indices (the XLA fast-path cap),
concatenating per-tap index runs column-major; consumes the (K, V, C) result
directly in the GEMM via dot_general dimension numbers (no transpose).
"""
import time
import numpy as np


def main():
    import jax, jax.numpy as jnp

    B, V, K, C, COUT = 1, 150_000, 27, 16, 16
    CHUNK = 13  # taps per gather: 13*150k ~ 1.95M indices
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32)).astype(jnp.bfloat16)
    idx_cols = np.sort(rng.integers(0, V, (K, V)).astype(np.int32), axis=1)  # monotone per tap
    idx = jnp.asarray(idx_cols)
    found = jnp.asarray(rng.random((K, V)) < 0.4)
    w = jnp.asarray(rng.normal(size=(K, C, COUT)).astype(np.float32) * 0.1).astype(jnp.bfloat16)

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name, ref=None):
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / 20
        err = "" if ref is None else f"  maxdiff={float(jnp.abs(out - ref).max()):.1e}"
        print(f"{name:44s} {dt*1e3:8.2f} ms{err}", flush=True)
        return out

    @jax.jit
    def pertap():
        cols = [feats[idx[t]] for t in range(K)]
        g = jnp.stack(cols, axis=0)                    # (K, V, C)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(g, w, (((0, 2), (0, 1)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    @jax.jit
    def chunked():
        gs = []
        for s in range(0, K, CHUNK):
            e = min(s + CHUNK, K)
            flat = idx[s:e].reshape(-1)                # ((e-s)*V,) column-major
            gs.append(feats[flat].reshape(e - s, V, C))
        g = jnp.concatenate(gs, axis=0)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(g, w, (((0, 2), (0, 1)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    @jax.jit
    def one_big():
        g = feats[idx.reshape(-1)].reshape(K, V, C)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(g, w, (((0, 2), (0, 1)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    ref = bench(pertap, "27 per-tap gathers + (K,V,C) GEMM")
    bench(chunked, "2 chunked gathers (13 taps each)", ref)
    bench(one_big, "1 gather of 4.05M (slow-path check)", ref)


if __name__ == "__main__":
    main()
