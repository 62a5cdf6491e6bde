"""Probe: GROUPED im2col gathers at train scale (batch 4).

The im2col phase is dispatch/latency-bound: the win mode issues g=K/3
take_along_axis ops per conv and per-tap issues K, each kept small to stay
on the <=2M-index gather fast path. At batch 4 that is 9-27 ops per gather,
x2 gathers per conv, x35 convs per train step -- thousands of ops whose
fixed overhead dominates (bb_grad_main 1286 ms vs ~500 ms of measured
component costs, exp_r3_train_breakdown).

Grouped variants pack G windows/taps into ONE take_along_axis op with
B*N*G <= budget indices: same bytes, ~G-fold fewer ops.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r3_grouped_gather.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--stages", type=str, default="",
                    help="comma list of stage substrings to run (default all)")
    ap.add_argument("--variants", type=str, default="",
                    help="comma list of variant substrings to run (default all)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import build_branch_rulebooks
    from cpd_tpu.models.detector import keys_from_frame
    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize_batch
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    rng = np.random.default_rng(0)
    b = args.batch
    spec = VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                (0.1, 0.1, 0.15), 90_000)
    grid = sparse.GridSpec(spec.grid_size[0], spec.grid_size[1],
                           spec.grid_size[2] + 1)
    pts = jnp.asarray(np.stack(
        [make_lidar_frame(rng, 200_000)[0] for _ in range(b)]))
    frame = voxelize_batch(pts, spec, jnp.ones((b, 200_000), bool))
    keys = keys_from_frame(frame, grid)
    caps = (80_000, 48_000, 24_000, 20_000)
    rbs = jax.jit(lambda k: build_branch_rulebooks(k, grid, caps))(keys)
    rbs = jax.tree_util.tree_map(jnp.asarray, rbs)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a)
        sync(out)
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:44s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    def win_grouped(features, idx, found, budget):
        bb, v, c = features.shape
        n, k = idx.shape[1], idx.shape[2]
        g = k // 3
        shift1 = jnp.pad(features[:, 1:], ((0, 0), (0, 1), (0, 0)))
        shift2 = jnp.pad(features[:, 2:], ((0, 0), (0, 2), (0, 0)))
        wtab = jnp.concatenate([features, shift1, shift2], axis=-1)
        idx_g = idx.reshape(bb, n, g, 3)
        found_g = found.reshape(bb, n, g, 3)
        big = jnp.where(found_g, idx_g, jnp.int32(1 << 30))
        base = jnp.min(big, axis=-1)
        base = jnp.where(jnp.any(found_g, -1), base, 0)
        base = jnp.minimum(base, v - 1)
        gper = max(1, budget // (bb * n))
        cols = []
        for j0 in range(0, g, gper):
            gi = base[:, :, j0:j0 + gper]
            gg = gi.shape[-1]
            w = jnp.take_along_axis(
                wtab, gi.reshape(bb, n * gg)[..., None], axis=1)
            cols.append(w.reshape(bb, n, gg, 3 * c))
        wins = jnp.concatenate(cols, axis=2).reshape(bb, n, g, 3, c)
        d = jnp.clip(idx_g - base[..., None], 0, 2)[..., None]
        sel = jnp.where(d == 0, wins[:, :, :, 0:1, :],
                        jnp.where(d == 1, wins[:, :, :, 1:2, :],
                                  wins[:, :, :, 2:3, :]))
        sel = jnp.where(found_g[..., None], sel, 0)
        return sel.reshape(bb, n, k, c)

    def tap_grouped(features, idx, found, budget):
        bb, v, c = features.shape
        n, k = idx.shape[1], idx.shape[2]
        gper = max(1, budget // (bb * n))
        outs = []
        for t0 in range(0, k, gper):
            gi = idx[:, :, t0:t0 + gper]
            gg = gi.shape[-1]
            w = jnp.take_along_axis(
                features, gi.reshape(bb, n * gg)[..., None], axis=1)
            outs.append(w.reshape(bb, n, gg, c))
        g = jnp.concatenate(outs, axis=2)
        return jnp.where(found[..., None], g, 0)

    stages = [
        ("stage1 c16", "subm1", 90_000, 16),
        ("stage2 c32", "subm2", caps[0], 32),
        ("stage3 c64", "subm3", caps[1], 64),
        ("stage4 c128", "subm4", caps[2], 128),
    ]
    dt = jnp.bfloat16
    M = 1_000_000
    stage_filter = [s for s in args.stages.split(",") if s]
    variant_filter = [s for s in args.variants.split(",") if s]
    for label, rbname, v, c in stages:
        if stage_filter and not any(s in label for s in stage_filter):
            continue
        rb = rbs[rbname]
        x = jnp.asarray(rng.normal(size=(b, v, c)).astype(np.float32)).astype(dt)
        w = jnp.asarray((rng.normal(size=(27, c, c)) * 0.1).astype(np.float32)).astype(dt)

        def mk_chain(gather):
            def chain(x, idx, found, valid, w):
                y = x
                for _ in range(args.chain):
                    g = gather(y, idx, found)
                    y = jax.lax.dot_general(
                        g, w, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
                        preferred_element_type=dt)
                    y = jnp.where(valid[..., None], y, 0)
                return y
            return jax.jit(chain)

        def per_sample(gather):
            def go(f, i, fo):
                return jnp.concatenate(
                    [gather(f[s:s + 1], i[s:s + 1], fo[s:s + 1])
                     for s in range(f.shape[0])], axis=0)
            return go

        variants = [
            ("win (current)", lambda f, i, fo: sparse.gather_rows_windowed(f, i, fo)),
            ("prod per-sample win", per_sample(
                lambda f, i, fo: sparse.gather_rows_windowed(f, i, fo))),
            ("win-g 2M", lambda f, i, fo: win_grouped(f, i, fo, 2 * M)),
            ("win-g 4M", lambda f, i, fo: win_grouped(f, i, fo, 4 * M)),
            ("ps win-g 2M", per_sample(
                lambda f, i, fo: win_grouped(f, i, fo, 2 * M))),
            ("tap-major (current)", None),  # special: tap-major layout
            ("tap-g 2M", lambda f, i, fo: tap_grouped(f, i, fo, 2 * M)),
            ("tap-g 4M", lambda f, i, fo: tap_grouped(f, i, fo, 4 * M)),
            ("ps tap-g 2M", per_sample(
                lambda f, i, fo: tap_grouped(f, i, fo, 2 * M))),
        ]
        # Correctness reference: ALWAYS the unfiltered baseline (win mode),
        # computed unbenchmarked, so --variants runs validate against the
        # production path rather than against each other (ADVICE r3).
        base_chain = mk_chain(
            lambda f, i, fo: sparse.gather_rows_windowed(f, i, fo))
        ref = np.asarray(
            base_chain(x, rb.idx, rb.found, rb.out_valid, w), np.float32)
        for name, gather in variants:
            if variant_filter and not any(s in name for s in variant_filter):
                continue
            if gather is None:
                def chain_tm(x, idx, found, valid, w):
                    y = x
                    for _ in range(args.chain):
                        g = sparse.gather_rows_tap_major(y, idx, found)
                        y = jax.lax.dot_general(
                            g, w, dimension_numbers=(((1, 3), (0, 1)), ((), ())),
                            preferred_element_type=dt)
                        y = jnp.where(valid[..., None], y, 0)
                    return y
                out = bench(jax.jit(chain_tm), f"{label} {name}",
                            x, rb.idx, rb.found, rb.out_valid, w)
            else:
                out = bench(mk_chain(gather), f"{label} {name}",
                            x, rb.idx, rb.found, rb.out_valid, w)
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            if err > 1e-2:
                print(f"  !! {name} mismatch {err}")


if __name__ == "__main__":
    main()
