"""Probe: voxelizer internals at bench scale (200k pts -> 90k voxels).

Pieces: key compute, argsort, point gather, fused segment-sum (sums+counts),
scatter-set keys, full voxelize; plus a cumsum-diff variant of the segment
sum (sorted segments: per-voxel sum = cumsum diff at boundaries -- replaces
the 24B-row scatter-ADD with one 4B-row scatter-SET + cumsum + 2 gathers).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2n_voxelizer.py
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

    from cpd_tpu.ops import voxelizer as vox
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    rng = np.random.default_rng(0)
    spec = vox.VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                    (0.1, 0.1, 0.15), 90_000)
    pts, _ = make_lidar_frame(rng, 200_000)
    pts = np.concatenate([pts, np.zeros((pts.shape[0], 2), np.float32)], 1)[:, :5]
    p = jnp.asarray(pts)
    v_cap = spec.max_voxels
    p_cap, c = p.shape

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:42s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    j = jax.jit
    big = jnp.iinfo(jnp.int32).max

    def upto_sort(pp):
        key = vox.compute_voxel_keys(pp, spec)
        sort_key = jnp.where(key >= 0, key, big)
        order = jnp.argsort(sort_key)
        return sort_key, order

    def upto_gather(pp):
        sort_key, order = upto_sort(pp)
        return sort_key[order], pp[order]

    def segsum(pp):
        sort_key, order = upto_sort(pp)
        skey = sort_key[order]
        first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
        first = first & (skey < big)
        slot = jnp.cumsum(first.astype(jnp.int32)) - 1
        ok = skey < big
        slot_c = jnp.where(ok & (slot < v_cap), slot, v_cap)
        sp = pp[order]
        aug = jnp.concatenate([sp, jnp.ones((p_cap, 1), pp.dtype)], 1)
        sums = jax.ops.segment_sum(jnp.where(ok[:, None], aug, 0.0), slot_c,
                                   num_segments=v_cap + 1)[:v_cap]
        return sums

    def cumsum_diff(pp):
        sort_key, order = upto_sort(pp)
        skey = sort_key[order]
        first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
        first = first & (skey < big)
        slot = jnp.cumsum(first.astype(jnp.int32)) - 1
        ok = skey < big
        sp = pp[order]
        aug = jnp.concatenate([sp, jnp.ones((p_cap, 1), pp.dtype)], 1)
        cs = jnp.cumsum(jnp.where(ok[:, None], aug, 0.0), axis=0)
        # starts[v] = index of the first point of voxel v (scatter-set of
        # first rows); ends[v] = starts[v+1]-1 (last voxel's end = last ok)
        slot_c = jnp.where(first & (slot < v_cap), slot, v_cap)
        starts = jnp.full((v_cap + 1,), p_cap - 1, jnp.int32).at[slot_c].set(
            jnp.arange(p_cap, dtype=jnp.int32), mode="drop")
        n_ok = jnp.sum(ok.astype(jnp.int32))
        ends = jnp.concatenate([starts[1:v_cap], jnp.array([p_cap], jnp.int32)])
        nv = slot[-1] + 1  # can't know statically; mask by count below
        # sums[v] = cs[ends[v]-1] - cs[starts[v]-1]
        valid_v = jnp.arange(v_cap) < jnp.minimum(nv, v_cap)
        e = jnp.clip(jnp.where(valid_v, ends - 1, 0), 0, p_cap - 1)
        s = starts[:v_cap]
        cs_e = cs[e]
        cs_s = jnp.where((s > 0)[:, None], cs[jnp.clip(s - 1, 0, p_cap - 1)], 0.0)
        return jnp.where(valid_v[:, None], cs_e - cs_s, 0.0)

    bench(j(upto_sort), "keys + argsort", p)
    bench(j(upto_gather), "+ point gather", p)
    o1 = bench(j(segsum), "segment-sum (prod)", p)
    o2 = bench(j(cumsum_diff), "cumsum-diff variant", p)
    d = np.abs(np.asarray(o1) - np.asarray(o2))
    print("max |delta| sums:", float(d.max()))
    bench(j(lambda pp: vox.voxelize(pp, spec)), "full voxelize (prod)", p)


if __name__ == "__main__":
    main()
