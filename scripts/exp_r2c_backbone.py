"""Probe: where do the backbone's unexplained ~60 ms go?

Reconstruct one stage-0 subm chain (5 convs at V=150k, C=16) as pure ops and
time variants:
  a) full: 27 per-tap gathers + found-mask + GEMM + eval-BN + relu, x5
  b) no-mask: not-found taps routed to a zero pad row (no (K,V,C) where pass)
  c) no-bn: drop the BN+relu elementwise tail
  d) single conv (chain/5 linearity check)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2c_backbone.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--v", type=int, default=150_016)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--layers", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    V, C, K, L = args.v, args.c, 27, args.layers
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, V, C)).astype(np.float32)).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, V, (1, V, K)).astype(np.int32))
    found = jnp.asarray(rng.random((1, V, K)) < 0.4)
    ws = [jnp.asarray((rng.normal(size=(K, C, C)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
          for _ in range(L)]
    scale = jnp.asarray(rng.uniform(0.9, 1.1, (C,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(0, 0.1, (C,)).astype(np.float32))
    # variant b: pre-route not-found taps to a zero pad row (once, shared)
    idx_z = jnp.where(found, idx, V)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a); sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:48s} {(time.perf_counter() - t0) / args.iters * 1e3:8.2f} ms",
              flush=True)

    def conv_masked(x, w):
        cols = [jnp.take_along_axis(x, idx[:, :, t][..., None], axis=1) for t in range(K)]
        g = jnp.stack(cols, axis=1)
        g = jnp.where(jnp.swapaxes(found, 1, 2)[..., None], g, 0)
        return jax.lax.dot_general(g, w, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    def conv_zerorow(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        cols = [jnp.take_along_axis(xp, idx_z[:, :, t][..., None], axis=1) for t in range(K)]
        g = jnp.stack(cols, axis=1)
        return jax.lax.dot_general(g, w, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                                   preferred_element_type=jnp.bfloat16)

    def bn_relu(x):
        return jnp.maximum(x * scale + shift, 0).astype(jnp.bfloat16)

    def chain(conv, with_bn=True, n=L):
        def f(x):
            for i in range(n):
                x = conv(x, ws[i])
                if with_bn:
                    x = bn_relu(x)
            return x
        return jax.jit(f)

    bench(chain(conv_masked), f"a) {L}x masked conv+bn+relu", feats)
    bench(chain(conv_zerorow), f"b) {L}x zero-row conv+bn+relu", feats)
    bench(chain(conv_masked, with_bn=False), f"c) {L}x masked conv, no bn", feats)
    bench(chain(conv_masked, n=1), "d) 1x masked conv+bn+relu", feats)


if __name__ == "__main__":
    main()
