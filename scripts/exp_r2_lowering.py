"""Round-2 lowering experiments (one TPU session, many probes).

A. chunked flattened im2col gather (<=2M idx/op) vs K per-tap gathers
B. chunked flattened LUT lookup vs per-tap-row lookups (rulebook + query scale)
C. packed 4-wide LUT rows: 2 wide gathers per dx-triple + lane select
D. first-k-found (cumsum + one-hot contraction) vs top_k nearest selection
E. Pallas in-kernel gather retry: broadcasted take_along_axis form

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_r2_lowering.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default="ABCDE")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        try:
            out = fn(*a); sync(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
            return out, dt
        except Exception as e:
            print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
            return None, None

    # ---------------- A: chunked im2col gather ----------------
    if "A" in args.only:
        print("== A: im2col gather formulations (bf16 rows) ==")
        for V, C in ((150_016, 16), (80_000, 32), (40_000, 64)):
            K = 27
            table = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32)).astype(jnp.bfloat16)
            idx = jnp.asarray(rng.integers(0, V, (V, K)).astype(np.int32))

            def per_tap(t, i):
                return jnp.stack([t[i[:, k]] for k in range(K)], axis=1)

            def chunked(t, i, max_idx=2_000_000):
                per = max(1, min(K, max_idx // t.shape[0]))
                outs = []
                for k0 in range(0, K, per):
                    ii = i[:, k0:k0 + per]
                    nt = ii.shape[1]
                    outs.append(t[ii.reshape(-1)].reshape(t.shape[0], nt, C))
                return jnp.concatenate(outs, axis=1)

            o1, _ = bench(jax.jit(per_tap), f"V={V} C={C} per-tap (27 gathers)", table, idx)
            o2, _ = bench(jax.jit(chunked), f"V={V} C={C} chunked<=2M ({-(-V*K//2_000_000)} gathers)", table, idx)
            if o1 is not None and o2 is not None:
                assert np.array_equal(np.asarray(o1), np.asarray(o2))

    # ---------------- B: LUT lookup formulations ----------------
    if "B" in args.only:
        print("== B: LUT lookups ==")
        for cells, P, Q, tag in ((92_700_000, 13, 150_016, "rulebook s0"),
                                 (1_554_000, 35, 43_200, "roi query x_conv3")):
            lut = jnp.asarray(rng.integers(-1, 80_000, (cells,)).astype(np.int32))
            qk = jnp.asarray(rng.integers(0, cells, (P, Q)).astype(np.int32))

            def per_row(l, q):
                return jnp.stack([l[q[t]] for t in range(P)])

            def flat(l, q):
                return l[q.reshape(-1)].reshape(P, Q)

            def chunked(l, q, max_idx=2_000_000):
                per = max(1, min(P, max_idx // Q))
                outs = []
                for t0 in range(0, P, per):
                    qq = q[t0:t0 + per]
                    outs.append(l[qq.reshape(-1)].reshape(qq.shape[0], Q))
                return jnp.concatenate(outs)

            o1, _ = bench(jax.jit(per_row), f"{tag}: per-tap-row ({P} gathers)", lut, qk)
            o2, _ = bench(jax.jit(flat), f"{tag}: one flat gather ({P*Q/1e6:.2f}M idx)", lut, qk)
            o3, _ = bench(jax.jit(chunked), f"{tag}: chunked<=2M", lut, qk)
            for o in (o2, o3):
                if o1 is not None and o is not None:
                    assert np.array_equal(np.asarray(o1), np.asarray(o))

    # ---------------- C: packed 4-wide LUT rows ----------------
    if "C" in args.only:
        print("== C: packed 4-wide LUT rows (dx-triples) ==")
        cells, Q = 92_700_000, 150_016
        nx, ny = 1504, 1504
        lut = jnp.asarray(rng.integers(-1, 80_000, (cells,)).astype(np.int32))
        keys = jnp.asarray(np.sort(rng.choice(cells - 3 * nx * ny, Q, replace=False) + nx * ny).astype(np.int32))
        # 4 dx-triple groups (dz,dy) + 1 single: the 13-tap positive half
        bases = [ny * nx - nx, ny * nx, ny * nx + nx, nx]  # (1,-1),(1,0),(1,1),(0,1)

        def narrow(l, k):
            outs = [l[k + 1]]
            for b in bases:
                for dx in (-1, 0, 1):
                    outs.append(l[k + b + dx])
            return jnp.stack(outs)

        cells4 = cells // 4
        lut4 = lut[: cells4 * 4].reshape(cells4, 4)

        def packed(l4, k):
            # NB: index the packed table for the single tap too -- closing
            # over the 371MB narrow lut embeds it as a program constant and
            # overflows the remote-compile request (HTTP 413)
            c0 = k + 1
            q0 = c0 >> 2
            row0 = l4[q0]
            lane4 = jax.lax.broadcasted_iota(jnp.int32, (Q, 4), 1)
            outs = [jnp.sum(jnp.where(lane4 == (c0 - (q0 << 2))[:, None], row0, 0), axis=1)]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (Q, 8), 1)
            for b in bases:
                base_cell = k + b - 1
                p0 = base_cell >> 2
                cat = jnp.concatenate([l4[p0], l4[p0 + 1]], axis=1)  # (Q, 8)
                off = base_cell - (p0 << 2)  # 0..3
                for dxi in range(3):
                    lane = off + dxi
                    sel = jnp.sum(jnp.where(lanes == lane[:, None], cat, 0), axis=1)
                    outs.append(sel)
            return jnp.stack(outs)

        o1, _ = bench(jax.jit(narrow), "narrow 13 per-tap gathers", lut, keys)
        o2, _ = bench(jax.jit(packed), "packed 9 wide gathers + lane select", lut4, keys)
        if o1 is not None and o2 is not None:
            assert np.array_equal(np.asarray(o1), np.asarray(o2))

    # ---------------- D: neighbor selection ----------------
    if "D" in args.only:
        print("== D: neighbor selection (W=35 taps -> 16 of 43200 queries) ==")
        W, Q, K = 35, 43_200, 16
        dist = jnp.asarray(rng.random((W, Q)).astype(np.float32) * 2)
        ok = jnp.asarray(rng.random((W, Q)) < 0.3)
        idxs = jnp.asarray(rng.integers(0, 40_000, (W, Q)).astype(np.int32))
        centers = jnp.asarray(rng.normal(size=(W, Q, 3)).astype(np.float32))

        def topk(dist, ok, idxs, centers):
            score = jnp.where(ok, -dist, -jnp.inf)
            ts, sel = jax.lax.top_k(score.T, K)
            si = jnp.take_along_axis(idxs.T, sel, axis=1)
            sv = jnp.isfinite(ts)
            sc = jnp.take_along_axis(jnp.transpose(centers, (1, 0, 2)), sel[..., None], axis=1)
            return si, sv, sc

        def firstk(dist, ok, idxs, centers):
            rank = jnp.cumsum(ok.astype(jnp.int32), axis=0)
            slot = rank - 1
            keep = ok & (slot < K)
            onehot = (keep[:, :, None]
                      & (slot[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (W, Q, K), 2)))
            oh = onehot.astype(jnp.float32)
            si = jnp.einsum("wq,wqk->qk", idxs.astype(jnp.float32), oh).astype(jnp.int32)
            sv = jnp.einsum("wq,wqk->qk", ok.astype(jnp.float32), oh) > 0
            sc = jnp.einsum("wqc,wqk->qkc", centers, oh)
            return si, sv, sc

        bench(jax.jit(topk), "top_k nearest", dist, ok, idxs, centers)
        bench(jax.jit(firstk), "first-k found (cumsum+one-hot)", dist, ok, idxs, centers)

    # ---------------- E: Pallas in-kernel gather retry ----------------
    if "E" in args.only:
        print("== E: Pallas in-kernel gather (take_along_axis broadcast) ==")
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        V, K, CIN, COUT, TILE = 80_000, 27, 32, 32, 256
        Vp = ((V + TILE - 1) // TILE) * TILE
        table = jnp.asarray(rng.normal(size=(Vp, CIN)).astype(np.float32)).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, V, (Vp, K)).astype(np.int32))
        found = jnp.asarray(rng.random((Vp, K)) < 0.4)
        w = jnp.asarray((rng.normal(size=(K * CIN, COUT)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)

        def xla_ref(t, i, f, ww):
            g = jnp.stack([t[i[:, k]] for k in range(K)], axis=1)
            g = jnp.where(f[..., None], g, 0)
            return jax.lax.dot_general(g.reshape(Vp, K * CIN), ww,
                                       dimension_numbers=(((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        o_ref, _ = bench(jax.jit(xla_ref), "XLA per-tap gather + GEMM", table, idx, found, w)

        def kernel(idx_ref, found_ref, table_ref, w_ref, out_ref):
            idxs = idx_ref[:].reshape(TILE * K)
            bidx = jnp.broadcast_to(idxs[:, None], (TILE * K, CIN))
            g = jnp.take_along_axis(table_ref[:], bidx, axis=0)
            g = g.reshape(TILE, K, CIN)
            g = jnp.where(found_ref[:][..., None], g, 0)
            out_ref[:] = jnp.dot(g.reshape(TILE, K * CIN), w_ref[:],
                                 preferred_element_type=jnp.float32)

        try:
            fused = pl.pallas_call(
                kernel,
                grid=(Vp // TILE,),
                in_specs=[
                    pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((Vp, CIN), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((K * CIN, COUT), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE, COUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Vp, COUT), jnp.float32),
                interpret=args.cpu,
            )
            o_b, _ = bench(jax.jit(lambda t, i, f, ww: fused(i, f, t, ww)),
                           "Pallas fused (broadcast take_along_axis)", table, idx, found, w)
            if o_ref is not None and o_b is not None:
                print("   maxdiff:", float(jnp.abs(o_ref - o_b).max()))
        except Exception as e:
            print(f"Pallas build FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
