"""Probe: voxelizer phase costs at bench scale (200k points, 90k cap).

The round-3 breakdown shows voxelize at 20.9 ms of a 168 ms frame -- this
dissects argsort / gather / scans / segment_sum / key-extraction to find
where it goes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r3_vox.py
"""
import time

import numpy as np


def timeit(fn, sync, iters=10):
    out = fn()
    sync(out)
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, compute_voxel_keys, voxelize_batch
    from cpd_tpu.utils.synthetic import make_lidar_frame

    spec = VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                (0.1, 0.1, 0.15), 90_000)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(np.stack([make_lidar_frame(rng, 200_000)[0]]))
    pv = jnp.ones((1, 200_000), bool)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    t = timeit(lambda: voxelize_batch(pts, spec, pv), sync)
    print(f"voxelize_batch (full):   {t*1e3:8.2f} ms")

    keys_fn = jax.jit(lambda p, v: jax.vmap(lambda pp, vv: compute_voxel_keys(pp, spec, vv))(p, v))
    keys = keys_fn(pts, pv)
    t = timeit(lambda: keys_fn(pts, pv), sync)
    print(f"  compute_voxel_keys:    {t*1e3:8.2f} ms")

    srt = jax.jit(lambda k: jnp.sort(k, axis=-1))
    t = timeit(lambda: srt(keys), sync)
    print(f"  sort (keys only):      {t*1e3:8.2f} ms")

    asrt = jax.jit(lambda k: jnp.argsort(k, axis=-1))
    order = asrt(keys)
    t = timeit(lambda: asrt(keys), sync)
    print(f"  argsort:               {t*1e3:8.2f} ms")

    gat = jax.jit(lambda p, o: jnp.take_along_axis(p, o[..., None], axis=1))
    t = timeit(lambda: gat(pts, order), sync)
    print(f"  gather points[order]:  {t*1e3:8.2f} ms")

    def segsum(p, o, k):
        sp = jnp.take_along_axis(p, o[..., None], axis=1)[0]
        sk = jnp.take_along_axis(k, o, axis=1)[0]
        first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
        slot = jnp.cumsum(first.astype(jnp.int32)) - 1
        aug = jnp.concatenate([sp, jnp.ones((sp.shape[0], 1), sp.dtype)], 1)
        return jax.ops.segment_sum(aug, jnp.minimum(slot, 90_000), num_segments=90_001)

    ss = jax.jit(segsum)
    t = timeit(lambda: ss(pts, order, keys), sync)
    print(f"  gathers+scan+segsum:   {t*1e3:8.2f} ms")

    # sort (key, idx) pairs packed in one int64-free way: sort key*?? --
    # packed KV sort via 64-bit is unavailable; try sort_pairs via lax.sort
    kv = jax.jit(lambda k: jax.lax.sort(
        (k[0], jnp.arange(k.shape[1], dtype=jnp.int32)), num_keys=1))
    t = timeit(lambda: kv(keys), sync)
    print(f"  lax.sort (k,v) pair:   {t*1e3:8.2f} ms")

    # 5-channel point payload carried THROUGH the sort (k + 5 floats + flag)
    kv6 = jax.jit(lambda k, p: jax.lax.sort(
        (k[0],) + tuple(p[0, :, i] for i in range(p.shape[-1])), num_keys=1))
    t = timeit(lambda: kv6(keys, pts), sync)
    print(f"  lax.sort k + 5 floats: {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
