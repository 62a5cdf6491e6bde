"""Probe 8: tall-skinny GEMM orientation for sparse convs.

(150k, 432) @ (432, 16) measured ~3.5 ms (20x off roofline). Try the
transposed orientation and padded-N variants.
"""
import time
import numpy as np


def main():
    import jax, jax.numpy as jnp

    M, K, N = 150_000, 432, 16
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    gT = jnp.asarray(rng.normal(size=(K, M)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32)).astype(jnp.bfloat16)
    w128 = jnp.asarray(rng.normal(size=(K, 128)).astype(np.float32)).astype(jnp.bfloat16)

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name):
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn()
        sync(out)
        print(f"{name:46s} {(time.perf_counter()-t0)/20*1e3:8.2f} ms", flush=True)

    dn = (((1,), (0,)), ((), ()))
    bench(jax.jit(lambda: jax.lax.dot_general(g, w, dn, preferred_element_type=jnp.float32)),
          "(M,K)@(K,16) f32 acc")
    bench(jax.jit(lambda: jax.lax.dot_general(g, w, dn, preferred_element_type=jnp.bfloat16)),
          "(M,K)@(K,16) bf16 out")
    bench(jax.jit(lambda: jax.lax.dot_general(g, w128, dn, preferred_element_type=jnp.float32)),
          "(M,K)@(K,128) f32 acc")
    # transposed orientation: (16,K)@(K,M) -> (16,M), then transpose back
    bench(jax.jit(lambda: jax.lax.dot_general(w.T, g, (((1,), (1,)), ((), ())),
                                              preferred_element_type=jnp.float32).T),
          "(16,K)@(M,K)^T -> T back")
    # contract with g already transposed in memory
    bench(jax.jit(lambda: jax.lax.dot_general(w.T, gT, (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.float32)),
          "(16,K)@(K,M) gT resident (no back-T)")


if __name__ == "__main__":
    main()
