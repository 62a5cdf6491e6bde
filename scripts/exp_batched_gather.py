"""Probe 6: batched per-tap gather formulations.

take_along_axis with a broadcast (B, V, 1) index may lower per-ELEMENT;
vmapped fancy row indexing should lower per-ROW. Stage-1 scale, B=1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_batched_gather.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--v", type=int, default=150_000)
    ap.add_argument("--cin", type=int, default=16)
    ap.add_argument("--k", type=int, default=27)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    B, V, K, C = args.b, args.v, args.k, args.cin
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, V, (B, V, K)).astype(np.int32))
    found = jnp.asarray(rng.random((B, V, K)) < 0.4)

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name, ref=None):
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        err = "" if ref is None else f"  maxdiff={float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()):.1e}"
        print(f"{name:40s} {dt*1e3:8.2f} ms{err}", flush=True)
        return out

    @jax.jit
    def tal():
        cols = [jnp.take_along_axis(feats, idx[:, :, t][..., None], axis=1)
                for t in range(K)]
        g = jnp.stack(cols, axis=2)
        return jnp.where(found[..., None], g, 0)

    @jax.jit
    def vmap_fancy():
        cols = [jax.vmap(lambda f, i: f[i])(feats, idx[:, :, t]) for t in range(K)]
        g = jnp.stack(cols, axis=2)
        return jnp.where(found[..., None], g, 0)

    @jax.jit
    def squeeze_b():  # B==1 special case: drop the batch axis entirely
        f0 = feats[0]
        cols = [f0[idx[0, :, t]] for t in range(K)]
        g = jnp.stack(cols, axis=1)[None]
        return jnp.where(found[..., None], g, 0)

    ref = bench(tal, "take_along_axis per tap")
    bench(vmap_fancy, "vmap fancy-index per tap", ref)
    if B == 1:
        bench(squeeze_b, "squeezed fancy-index per tap", ref)


def gemm_probe():
    import argparse, time
    import numpy as np
    import jax, jax.numpy as jnp

    B, V, K, C, COUT = 1, 150_000, 27, 16, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, V, (B, V, K)).astype(np.int32))
    found = jnp.asarray(rng.random((B, V, K)) < 0.4)
    w = jnp.asarray(rng.normal(size=(K * C, COUT)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    g_pre = jnp.asarray(rng.normal(size=(B * V, K * C)).astype(np.float32)).astype(jnp.bfloat16)

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name):
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        sync(out)
        print(f"{name:44s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms", flush=True)

    @jax.jit
    def gemm_only():
        return jax.lax.dot_general(g_pre, w, dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def gather_gemm_nomask():
        cols = [jnp.take_along_axis(feats, idx[:, :, t][..., None], axis=1) for t in range(K)]
        g = jnp.stack(cols, axis=2)
        return jax.lax.dot_general(g.reshape(B * V, K * C), w,
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def gather_gemm_mask():
        cols = [jnp.take_along_axis(feats, idx[:, :, t][..., None], axis=1) for t in range(K)]
        g = jnp.stack(cols, axis=2)
        g = jnp.where(found[..., None], g, 0)
        return jax.lax.dot_general(g.reshape(B * V, K * C), w,
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def gather_gemm_maskmul():
        # mask folded as a multiply instead of select
        cols = [jnp.take_along_axis(feats, idx[:, :, t][..., None], axis=1) for t in range(K)]
        g = jnp.stack(cols, axis=2)
        g = g * found[..., None].astype(g.dtype)
        return jax.lax.dot_general(g.reshape(B * V, K * C), w,
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    bench(gemm_only, "GEMM only (150k,432)@(432,16)")
    bench(gather_gemm_nomask, "gathers+GEMM, no mask")
    bench(gather_gemm_mask, "gathers+mask(where)+GEMM")
    bench(gather_gemm_maskmul, "gathers+mask(mul)+GEMM")




def real_conv_probe():
    import time
    import numpy as np
    import jax, jax.numpy as jnp
    from cpd_tpu.ops import sparse

    B, V, K, C, COUT = 1, 150_000, 27, 16, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, V, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, (B, V, K)).astype(np.int32))
    found = jnp.asarray(rng.random((B, V, K)) < 0.4)
    keys = jnp.asarray(np.sort(rng.choice(10**8, (B, V), replace=False).astype(np.int32)))
    valid = jnp.ones((B, V), bool)
    rb = sparse.Rulebook(idx=idx, found=found, out_keys=keys, out_valid=valid)
    w = jnp.asarray(rng.normal(size=(K, C, COUT)).astype(np.float32) * 0.1)

    def sync(x):
        np.asarray(x.ravel()[0])

    def bench(fn, name):
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn()
        sync(out)
        print(f"{name:44s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms", flush=True)

    bench(jax.jit(lambda: sparse.sparse_conv_apply_batched(
        feats, rb, w, compute_dtype=jnp.bfloat16, transpose="mirror")),
        "sparse_conv_apply_batched (custom vjp)")
    bench(jax.jit(lambda: sparse.sparse_conv_apply_batched(
        feats, rb, w, compute_dtype=jnp.bfloat16)),
        "sparse_conv_apply_batched (plain)")
    bench(jax.jit(lambda: sparse.sparse_conv_apply_batched(
        feats, rb, w, compute_dtype=jnp.bfloat16, transpose="mirror")),
        "custom vjp again (cache check)")


if __name__ == "__main__":
    import sys
    if sys.argv[-1] == "gemm":
        gemm_probe()
    elif sys.argv[-1] == "real":
        real_conv_probe()
    else:
        main()
