"""Probe: full-dense execution of the EARLY backbone stages on the chip.

Hypothesis (from the stage-4 dense-tail win + the round-3 breakdown:
rulebooks 60.8 ms + sparse convs 63.5 ms at 5.95 f/s): at stage-1/2
occupancies (~0.3%/2%), XLA dense conv3d on the MXU beats the sparse
gather-GEMM path because the MXU has idle FLOPs while the sparse path is
HBM-transaction-bound on gathers + rulebook LUT lookups.

Times, per stage, at bench scale (90k voxels, grid 752x752x42 stage 1):
  - to_dense scatter + mask build
  - the stage's conv ladder as dense conv3d (masked, bf16)
  - keys_from_dense_mask + rows_from_dense extraction
vs the measured sparse rulebook+conv costs from bench_breakdown.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_r3_dense_stages.py
"""
import time

import numpy as np


def timeit(fn, sync, iters=5):
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
    from cpd_tpu.models.detector import VoxelRCNN, keys_from_frame
    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.voxelizer import voxelize_batch
    from cpd_tpu.utils.synthetic import make_lidar_frame

    model = VoxelRCNN(
        num_classes=3, point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15), max_voxels=90_000,
        backbone_caps=(80_000, 48_000, 24_000, 20_000), mm=False,
    )
    rng = np.random.default_rng(0)
    pts = np.stack([make_lidar_frame(rng, 200_000)[0]])
    batch = {"points": jnp.asarray(pts), "points_valid": jnp.ones((1, 200_000), bool)}
    bound = model.bind({"params": {}})
    spec, grid = bound.vox_spec, bound.grid
    frame = jax.jit(lambda p, v: voxelize_batch(p, spec, v))(
        batch["points"], batch["points_valid"])
    keys = jax.jit(lambda f: keys_from_frame(f, grid))(frame)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    from cpd_tpu.models.backbone3d import stage_grids, _downsample_mask, build_branch_rulebooks

    g = stage_grids(grid)
    g1, g2, g3 = g["x_conv1"], g["x_conv2"], g["x_conv3"]
    # stage 1 (1504x1504x42 = 95M cells, 3 GB/activation at 16ch bf16) is
    # dense-infeasible on 16G HBM -- start the dense region at stage 2
    print(f"grids: s1 {g1.num_cells/1e6:.0f}M  s2 {g2.num_cells/1e6:.1f}M  s3 {g3.num_cells/1e6:.1f}M cells")

    # real x_conv2 keys from the rulebook chain (cap 80k)
    rbs = jax.jit(lambda k: build_branch_rulebooks(k, grid, (80_000, 48_000, 24_000, 20_000)))(keys)
    keys2 = rbs["down2"].out_keys
    feats2 = jnp.zeros((1, keys2.shape[-1], 32), jnp.bfloat16)

    def to_dense2(f, k):
        d = jax.vmap(lambda ff, kk: sparse.to_dense(ff, kk, g2, 32))(f, k)
        m = jax.vmap(lambda kk: sparse.dense_mask_from_keys(kk, g2))(k)
        return d, m

    td = jax.jit(to_dense2)
    dense2_real, mask2_real = td(feats2, keys2)
    t = timeit(lambda: td(feats2, keys2), sync)
    print(f"to_dense+mask stage2 (80k):  {t*1e3:8.2f} ms")

    # ---- dense conv ladders per stage ------------------------------------
    def ladder(x, mask, c_out, n_subm, stride_down=None):
        """n_subm masked 3^3 convs at c_out (direct XLA conv3d, no im2col)."""
        def conv(h, cout, mask_):
            w = jnp.full((3, 3, 3, h.shape[-1], cout), 0.01, jnp.bfloat16)
            out = jax.lax.conv_general_dilated(
                h.astype(jnp.bfloat16), w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return out * mask_[..., None]
        h = x
        for i in range(n_subm):
            h = conv(h, c_out, mask)
        return h

    def dense_ladder_stage(dense_in, mask, c_out, n_subm):
        return ladder(dense_in, mask, c_out, n_subm)

    # stage 2: down2-equivalent + 4 subm at 32ch (res2a/res2b) on 752x752x21
    mask2 = mask2_real
    dense2 = dense2_real

    f2 = jax.jit(lambda d, m: dense_ladder_stage(d, m, 32, 5))
    o = f2(dense2, mask2)
    t2 = timeit(lambda: f2(dense2, mask2), sync)
    print(f"stage2 dense 5x subm32:      {t2*1e3:8.2f} ms")

    mask3 = jax.jit(lambda m: _downsample_mask(m, (3, 3, 3), (2, 2, 2), (1, 1, 1)))(mask2)
    dense3 = jnp.zeros((1, g3.nz, g3.ny, g3.nx, 64), jnp.bfloat16)
    f3 = jax.jit(lambda d, m: dense_ladder_stage(d, m, 64, 5))
    o = f3(dense3, mask3)
    t3 = timeit(lambda: f3(dense3, mask3), sync)
    print(f"stage3 dense 5x subm64:      {t3*1e3:8.2f} ms")

    # strided dense down3 (stage2 -> stage3 grid)
    def down3(d, m):
        w = jnp.full((3, 3, 3, 32, 64), 0.01, jnp.bfloat16)
        out = jax.lax.conv_general_dilated(
            d, w, (2, 2, 2), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return out * m[..., :out.shape[1], :out.shape[2], :out.shape[3], None]
    fd = jax.jit(lambda d, m: down3(d, mask3))
    o = fd(dense2, mask3)
    tdn = timeit(lambda: fd(dense2, mask3), sync)
    print(f"down3 dense strided:         {tdn*1e3:8.2f} ms")

    # ---- extraction back to sparse rows ----------------------------------
    def extract(x, m, cap):
        k, _ = jax.vmap(lambda mm: sparse.keys_from_dense_mask(mm.reshape(-1), cap))(m)
        r = jax.vmap(sparse.rows_from_dense)(x.reshape(x.shape[0], -1, x.shape[-1]), k)
        return k, r

    e3 = jax.jit(lambda x, m: extract(x, m, 48_000))
    o = e3(dense3, mask3)
    te = timeit(lambda: e3(dense3, mask3), sync)
    print(f"extract keys+rows stage3:    {te*1e3:8.2f} ms")

    e2 = jax.jit(lambda x, m: extract(x, m, 80_000))
    o = e2(dense2, mask2)
    te2 = timeit(lambda: e2(dense2, mask2), sync)
    print(f"extract keys+rows stage2:    {te2*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
