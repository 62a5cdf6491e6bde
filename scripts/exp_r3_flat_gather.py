"""Probe: FLAT-addressed im2col gathers at train scale (batch 4).

exp_r3_grouped_gather showed batched take_along_axis scales WORSE than
linearly with batch (stage2 win: 4.7 ms/conv at b1 -> 39 ms at b4). The
grouped variants (still batch-dim gathers) lost too. This probes collapsing
the batch dim instead: one (b*v, C)-row table, per-sample row offsets added
to the indices, plain fancy-index row gathers chunked to <= 2M indices per
op (the XLA fast-path cliff).

  win (current)   9 batched take_along_axis ops       (baseline)
  win-flat-c      flat window gathers, <=2M chunks
  tap-flat-c      flat per-tap gathers, <=2M chunks
  win b1 x4       the b=1 chain run 4x sequentially   (scaling reference)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r3_flat_gather.py
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

    M = 2_000_000

    def win_flat_chunked(features, idx, found):
        bb, v, c = features.shape
        n, k = idx.shape[1], idx.shape[2]
        g = k // 3
        shift1 = jnp.pad(features[:, 1:], ((0, 0), (0, 1), (0, 0)))
        shift2 = jnp.pad(features[:, 2:], ((0, 0), (0, 2), (0, 0)))
        wtab = jnp.concatenate([features, shift1, shift2],
                               axis=-1).reshape(bb * v, 3 * c)
        idx_g = idx.reshape(bb, n, g, 3)
        found_g = found.reshape(bb, n, g, 3)
        big = jnp.where(found_g, idx_g, jnp.int32(1 << 30))
        base = jnp.min(big, axis=-1)
        base = jnp.where(jnp.any(found_g, -1), base, 0)
        base = jnp.minimum(base, v - 1)
        off = (jnp.arange(bb, dtype=base.dtype) * v)[:, None, None]
        baseoff = base + off  # (bb, n, g)
        gper = max(1, M // (bb * n))
        cols = []
        for j0 in range(0, g, gper):
            gi = baseoff[:, :, j0:j0 + gper]
            gg = gi.shape[-1]
            w = wtab[gi.reshape(-1)]
            cols.append(w.reshape(bb, n, gg, 3 * c))
        wins = jnp.concatenate(cols, axis=2).reshape(bb, n, g, 3, c)
        d = jnp.clip(idx_g - base[..., None], 0, 2)[..., None]
        sel = jnp.where(d == 0, wins[:, :, :, 0:1, :],
                        jnp.where(d == 1, wins[:, :, :, 1:2, :],
                                  wins[:, :, :, 2:3, :]))
        sel = jnp.where(found_g[..., None], sel, 0)
        return sel.reshape(bb, n, k, c)

    def tap_flat_chunked(features, idx, found):
        bb, v, c = features.shape
        n, k = idx.shape[1], idx.shape[2]
        flat = features.reshape(bb * v, c)
        off = (jnp.arange(bb, dtype=idx.dtype) * v)[:, None, None]
        idxo = idx + off
        gper = max(1, M // (bb * n))
        outs = []
        for t0 in range(0, k, gper):
            gi = idxo[:, :, t0:t0 + gper]
            gg = gi.shape[-1]
            outs.append(flat[gi.reshape(-1)].reshape(bb, n, gg, c))
        g = jnp.concatenate(outs, axis=2)
        return jnp.where(found[..., None], g, 0)

    stages = [
        ("stage1 c16", "subm1", 90_000, 16),
        ("stage2 c32", "subm2", caps[0], 32),
        ("stage3 c64", "subm3", caps[1], 64),
        ("stage4 c128", "subm4", caps[2], 128),
    ]
    dt = jnp.bfloat16
    for label, rbname, v, c in stages:
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

        ref = bench(mk_chain(lambda f, i, fo: sparse.gather_rows_windowed(f, i, fo)),
                    f"{label} win (current)", x, rb.idx, rb.found, rb.out_valid, w)
        ref = np.asarray(ref, np.float32)
        for name, gather in (("win-flat-c", win_flat_chunked),
                             ("tap-flat-c", tap_flat_chunked)):
            out = bench(mk_chain(gather), f"{label} {name}",
                        x, rb.idx, rb.found, rb.out_valid, w)
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            rel = err / (float(np.max(np.abs(ref))) + 1e-9)
            if rel > 2e-2:
                print(f"  !! {name} rel mismatch {rel:.4f}")

        # batch-1 scaling reference: the same chain vmap-free on one sample
        chain1 = mk_chain(lambda f, i, fo: sparse.gather_rows_windowed(f, i, fo))

        def seq4(x, idx, found, valid, w):
            outs = [chain1(x[i:i + 1], idx[i:i + 1], found[i:i + 1],
                           valid[i:i + 1], w) for i in range(b)]
            return jnp.concatenate(outs, 0)

        bench(jax.jit(seq4), f"{label} win b1 x{b} seq",
              x, rb.idx, rb.found, rb.out_valid, w)


if __name__ == "__main__":
    main()
