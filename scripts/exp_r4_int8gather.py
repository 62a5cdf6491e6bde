"""Probe: int8 feature tables for the im2col GATHER phase.

Round-4 fetch-cost data fits a ~32B-granule issue model (row cost scales
with row bytes above ~128B: stage1 96B ~3.5 ns, stage2 192B ~6 ns, stage3
384B ~10.6 ns). If true, an int8 window table halves the granule count of
the stage-2/3 gathers. This probe times 4-conv chains:

  bf16 (current)   -- windowed gather from the (V, 3C) bf16 table
  int8-gather      -- quantize activations to int8 per conv, gather int8
                      rows, dequant to bf16, GEMM in bf16 (includes the
                      per-conv quantize+dequant overhead)

Timing-only: accuracy impact is a separate study (per-tensor scale here).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r4_int8gather.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
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
    spec = VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                (0.1, 0.1, 0.15), 90_000)
    grid = sparse.GridSpec(spec.grid_size[0], spec.grid_size[1],
                           spec.grid_size[2] + 1)
    pts = jnp.asarray(np.stack([make_lidar_frame(rng, 200_000)[0]]))
    frame = voxelize_batch(pts, spec, jnp.ones((1, 200_000), bool))
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
        print(f"{name:40s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    def win_base(features, idx, found):
        """Window base ranks for dx-runs of 3 (shared by both variants)."""
        v = features.shape[0]
        n, k = idx.shape
        g = k // 3
        idx_g = idx.reshape(n, g, 3)
        found_g = found.reshape(n, g, 3)
        big = jnp.where(found_g, idx_g, jnp.int32(1 << 30))
        base = jnp.min(big, axis=-1)
        base = jnp.where(jnp.any(found_g, -1), base, 0)
        return jnp.minimum(base, v - 1), idx_g, found_g

    def win_select(wins, base, idx_g, found_g, n, g, c):
        d = jnp.clip(idx_g - base[..., None], 0, 2)[..., None]
        sel = jnp.where(d == 0, wins[:, :, 0:1, :],
                        jnp.where(d == 1, wins[:, :, 1:2, :],
                                  wins[:, :, 2:3, :]))
        return jnp.where(found_g[..., None], sel, 0).reshape(n, g * 3, c)

    def gather_bf16(features, idx, found):
        v, c = features.shape
        n, k = idx.shape
        g = k // 3
        shift1 = jnp.pad(features[1:], ((0, 1), (0, 0)))
        shift2 = jnp.pad(features[2:], ((0, 2), (0, 0)))
        wtab = jnp.concatenate([features, shift1, shift2], axis=-1)
        base, idx_g, found_g = win_base(features, idx, found)
        cols = [wtab[base[:, j]] for j in range(g)]
        wins = jnp.stack(cols, axis=1).reshape(n, g, 3, c)
        return win_select(wins, base, idx_g, found_g, n, g, c)

    def gather_int8(features, idx, found):
        v, c = features.shape
        n, k = idx.shape
        g = k // 3
        # per-tensor symmetric quant of the activations
        scale = jnp.max(jnp.abs(features.astype(jnp.float32))) / 127.0 + 1e-12
        q = jnp.clip(jnp.round(features.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        shift1 = jnp.pad(q[1:], ((0, 1), (0, 0)))
        shift2 = jnp.pad(q[2:], ((0, 2), (0, 0)))
        wtab = jnp.concatenate([q, shift1, shift2], axis=-1)  # (V, 3C) int8
        base, idx_g, found_g = win_base(features, idx, found)
        cols = [wtab[base[:, j]] for j in range(g)]
        wins = (jnp.stack(cols, axis=1).reshape(n, g, 3, c)
                .astype(jnp.bfloat16) * jnp.bfloat16(scale))
        return win_select(wins, base, idx_g, found_g, n, g, c)

    dt = jnp.bfloat16
    stages = [
        ("stage2 c32", "subm2", caps[0], 32),
        ("stage3 c64", "subm3", caps[1], 64),
        ("stage4 c128", "subm4", None, 128),
    ]
    for label, rbname, v, c in stages:
        if rbname not in rbs:
            continue
        rb = rbs[rbname]
        v = rb.idx.shape[1]
        x = jnp.asarray(rng.normal(size=(v, c)).astype(np.float32)).astype(dt)
        w = jnp.asarray((rng.normal(size=(27, c, c)) * 0.1).astype(np.float32)).astype(dt)

        def chain(x, idx, found, valid, w, gather):
            y = x
            for _ in range(args.chain):
                gth = gather(y, idx, found).reshape(y.shape[0], 27, c)
                y = jax.lax.dot_general(
                    gth, w, dimension_numbers=(((1, 2), (0, 1)), ((), ())),
                    preferred_element_type=dt)
                y = jnp.where(valid[..., None], y, 0)
            return y

        import functools
        ref = bench(jax.jit(functools.partial(chain, gather=gather_bf16)),
                    f"{label} win bf16", x, rb.idx[0], rb.found[0],
                    rb.out_valid[0], w)
        got = bench(jax.jit(functools.partial(chain, gather=gather_int8)),
                    f"{label} win int8-gather", x, rb.idx[0], rb.found[0],
                    rb.out_valid[0], w)
        ref32 = np.asarray(ref, np.float32)
        got32 = np.asarray(got, np.float32)
        denom = max(1e-6, float(np.max(np.abs(ref32))))
        print(f"  rel err {float(np.max(np.abs(got32 - ref32))) / denom:.4f}")


if __name__ == "__main__":
    main()
