"""Probe: attribute the voxelizer's ~5.8 ms of non-sort cost (roofline2).

exp_r5_roofline2 measured the 200k 7-operand sort at 0.75 ms device-side
but the voxelize stage at 6.6 ms. This dissects the remaining phases with
the same fori-loop-slope + full-consume method, and A/B-tests the one cheap
candidate fix: ``indices_are_sorted=True`` on the segment-sum scatter-add
(the points ARE slot-sorted when max_points_per_voxel is None -- the bench
MeanVFE path) and on the voxel-key scatter-set.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r5_vox2.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k-hi", type=int, default=24)
    ap.add_argument("--k-lo", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    import jax.lax as lax
    import jax.numpy as jnp

    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize_batch
    from cpd_tpu.utils.synthetic import make_lidar_frame

    rng = np.random.default_rng(0)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])

    def consume(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def dep(x, s):
        return jnp.where(s > jnp.float32(3.0e38), x + jnp.ones((), x.dtype), x)

    def loop_time(body, state):
        fns = {k: jax.jit(lambda s, k=k: lax.fori_loop(0, k, body, s))
               for k in (args.k_lo, args.k_hi)}
        for f in fns.values():
            sync(f(state))
        ests = []
        for _ in range(args.reps):
            ts = {}
            for k in (args.k_lo, args.k_hi):
                t0 = time.perf_counter()
                sync(fns[k](state))
                ts[k] = time.perf_counter() - t0
            ests.append((ts[args.k_hi] - ts[args.k_lo])
                        / (args.k_hi - args.k_lo))
        return float(np.median(ests))

    p, v_cap = 200_000, 90_000
    spec = VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                (0.1, 0.1, 0.15), v_cap)
    pts = np.stack([make_lidar_frame(rng, p)[0]])
    pts_j = jnp.asarray(pts)
    valid = jnp.ones((1, p), bool)

    # realistic sorted-phase inputs: run the real front half once
    from cpd_tpu.ops.voxelizer import compute_voxel_keys

    key = compute_voxel_keys(pts_j[0], spec, valid[0])
    big = jnp.iinfo(jnp.int32).max
    sort_key = jnp.where(key >= 0, key, big)
    iota = jnp.arange(p, dtype=jnp.int32)
    c = pts.shape[-1]
    sorted_ops = jax.lax.sort(
        (sort_key, iota) + tuple(pts_j[0][:, i] for i in range(c)), num_keys=2)
    skey = sorted_ops[0]
    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    first = first & (skey < big)
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1
    point_ok = skey < big
    slot_clipped = jnp.where(point_ok & (slot < v_cap), slot, v_cap)
    sorted_pts = jnp.stack(sorted_ops[2:], axis=-1)
    aug = jnp.concatenate([sorted_pts, jnp.ones((p, 1), jnp.float32)], axis=1)
    aug_masked = jnp.where(point_ok[:, None], aug, 0.0)
    key_slot = jnp.where(first & (slot < v_cap), slot, v_cap)

    comp = {}

    def record(name, t):
        comp[name] = t
        print(f"  {name:34s} {t*1e3:7.2f} ms", flush=True)

    # full voxelize (production, squeezed path)
    def body_full(i, P):
        out = voxelize_batch(P, spec, valid)
        return dep(P, consume((out.features, out.valid, out.num_points)))
    record("full voxelize_batch", loop_time(body_full, pts_j))

    # phases
    def body_keys(i, P):
        k = compute_voxel_keys(P, spec, valid[0])
        return dep(P, consume(k))
    record("compute_keys", loop_time(body_keys, pts_j[0]))

    def body_sort(i, st):
        out = jax.lax.sort((st[0], iota) + tuple(st[1][:, i2] for i2 in range(c)),
                           num_keys=2)
        return (dep(out[0], consume(out)), st[1])
    record("sort (7-operand)", loop_time(body_sort, (sort_key, pts_j[0])))

    def body_flags(i, sk):
        f1 = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
        f1 = f1 & (sk < big)
        sl = jnp.cumsum(f1.astype(jnp.int32)) - 1
        return dep(sk, consume((f1, sl)))
    record("flags+cumsum", loop_time(body_flags, skey))

    def body_seg(i, a):
        sums = jax.ops.segment_sum(a, slot_clipped, num_segments=v_cap + 1)
        return dep(a, consume(sums))
    record("segment_sum (as shipped)", loop_time(body_seg, aug_masked))

    def body_seg_sorted(i, a):
        sums = jax.ops.segment_sum(a, slot_clipped, num_segments=v_cap + 1,
                                   indices_are_sorted=True)
        return dep(a, consume(sums))
    record("segment_sum sorted=True", loop_time(body_seg_sorted, aug_masked))

    def body_seg_sorted_uniq(i, a):
        # one-hot matmul alternative is O(P*V) -- not viable; instead test
        # the scatter with BOTH hints (indices sorted; not unique)
        sums = jnp.zeros((v_cap + 1, a.shape[1]), a.dtype).at[slot_clipped].add(
            a, indices_are_sorted=True, unique_indices=False)
        return dep(a, consume(sums))
    record("scatter-add sorted hint", loop_time(body_seg_sorted_uniq, aug_masked))

    def body_kscatter(i, sk):
        vk = jnp.full((v_cap + 1,), -1, jnp.int32).at[key_slot].set(
            sk, mode="drop")
        return dep(sk, consume(vk))
    record("voxel-key scatter-set", loop_time(body_kscatter, skey))

    rest = comp["full voxelize_batch"] - (
        comp["compute_keys"] + comp["sort (7-operand)"] + comp["flags+cumsum"]
        + comp["segment_sum (as shipped)"] + comp["voxel-key scatter-set"])
    print(f"\nunattributed rest of full: {rest*1e3:.2f} ms")
    print(f"segment_sum sorted-hint delta: "
          f"{(comp['segment_sum (as shipped)'] - comp['segment_sum sorted=True'])*1e3:.2f} ms")


if __name__ == "__main__":
    main()
