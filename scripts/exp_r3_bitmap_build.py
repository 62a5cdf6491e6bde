"""Probe: bitmap vs sort strided active-set derivation + full rulebook builds.

Times, at bench-ladder scale (beam-structured frame occupancies):
  - _strided_out_keys_bitmap vs _strided_out_keys_sort at down2/down3/down4
  - full build_conv_rulebook_batched at each stage (the shipped path)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_r3_bitmap_build.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import stage_grids
    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize_batch
    from cpd_tpu.models.detector import keys_from_frame
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    rng = np.random.default_rng(0)
    pts = np.stack([make_lidar_frame(rng, 200_000)[0]])
    spec = VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                (0.1, 0.1, 0.15), 90_000)
    frame = voxelize_batch(jnp.asarray(pts), spec, jnp.ones((1, 200_000), bool))
    grid = GridSpec(spec.grid_size[0], spec.grid_size[1], spec.grid_size[2] + 1)
    keys0 = keys_from_frame(frame, grid)
    g = stage_grids(grid)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def timeit(fn, *a, iters=8, label=""):
        fj = jax.jit(fn)
        t0 = time.perf_counter()
        out = fj(*a)
        sync(out)
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fj(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:>42s}: {dt:7.2f} ms  (compile {compile_t:.0f}s)", flush=True)
        return out

    stages = [
        ("down2", keys0, g["x_conv1"], g["x_conv2"], (3, 3, 3), (2, 2, 2), (1, 1, 1), 80_000),
        ("down3", None, g["x_conv2"], g["x_conv3"], (3, 3, 3), (2, 2, 2), (1, 1, 1), 48_000),
        ("down4", None, g["x_conv3"], g["x_conv4"], (3, 3, 3), (2, 2, 2), (1, 1, 0), 24_000),
        ("conv_out", None, g["x_conv4"], g["encoded"], (1, 1, 3), (1, 1, 2), (0, 0, 0), 20_000),
    ]
    keys = keys0
    for name, _, gi, go, kern, stride, pad, cap in stages:
        kb = timeit(
            lambda k, gi=gi, go=go, kern=kern, stride=stride, pad=pad, cap=cap:
            jax.vmap(lambda kk: sparse._strided_out_keys_bitmap(
                kk, gi, go, kern, stride, pad, cap))(k),
            keys, label=f"{name} out-keys bitmap")
        timeit(
            lambda k, gi=gi, go=go, kern=kern, stride=stride, pad=pad, cap=cap:
            jax.vmap(lambda kk: sparse._strided_out_keys_sort(
                kk, gi, go, kern, stride, pad, cap))(k),
            keys, label=f"{name} out-keys sort")
        rb = timeit(
            lambda k, gi=gi, kern=kern, stride=stride, pad=pad, cap=cap:
            sparse.build_conv_rulebook_batched(k, gi, kern, stride, pad, cap)[0],
            keys, label=f"{name} full rulebook (bitmap)")
        nb = np.asarray(kb[0])
        print(f"{'':>42s}  occupancy {int((nb != INVALID_KEY).sum())}/{cap}")
        keys = rb.out_keys

    # inverse rulebook: grouped-dynamic vs per-tap lookups at down2_T scale
    k1 = keys0
    rb2, _ = sparse.build_conv_rulebook_batched(
        k1, g["x_conv1"], (3, 3, 3), (2, 2, 2), (1, 1, 1), 80_000)
    lut1 = sparse.build_bitmap_lut_batched(rb2.out_keys, g["x_conv2"])
    timeit(lambda a, b, l: sparse.build_inverse_rulebook_batched(
        a, b, g["x_conv1"], g["x_conv2"], (3, 3, 3), (2, 2, 2), (1, 1, 1),
        out_lut=l), k1, rb2.out_keys, lut1, label="down2_T inverse (grouped)")


if __name__ == "__main__":
    main()
