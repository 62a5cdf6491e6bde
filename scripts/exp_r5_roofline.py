"""Per-stage roofline of the batch-1 inference frame (VERDICT r4 weak #1).

For each stage of the bench pipeline this script computes an ANALYTIC FLOOR
from component costs that are each CALIBRATED on-chip in this same process:

  * random-row gather cost (ns/row) measured on the stage's own feature
    table and real rulebook indices -- the conv/books/query fetch currency;
  * MXU rate measured on a representative dense conv (the compiler never
    hits peak on our shapes; using the MEASURED rate keeps the floor honest);
  * lax.sort throughput at the voxelizer's size;
  * per-op dispatch latency (tiny-gather time).

and compares it with the MEASURED per-stage time (same nested-jit deltas as
bench_breakdown.py). The residual column is what a better lowering could
still recover; the frame summary prints MFU and HBM-utilization figures.

v5e-1 peaks used for utilization: 197 TFLOP/s bf16, 819 GB/s HBM.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r5_roofline.py
"""
import argparse
import time

import numpy as np

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def timeit(fn, sync, iters=8):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--max-voxels", type=int, default=90_000)
    ap.add_argument("--caps", type=int, nargs=4,
                    default=(80_000, 48_000, 24_000, 20_000))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import build_branch_rulebooks, stage_grids
    from cpd_tpu.models.detector import VoxelRCNN, keys_from_frame
    from cpd_tpu.ops.voxelizer import voxelize_batch
    from cpd_tpu.utils.synthetic import make_lidar_frame

    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=args.max_voxels,
        backbone_caps=tuple(args.caps),
        mm=False, num_rois=500, num_rois_test=200, roi_per_image=130,
        dense_tail=True,
    )
    b, p = 1, 200_000
    rng = np.random.default_rng(0)
    pts = np.stack([make_lidar_frame(rng, p)[0] for _ in range(b)])
    batch = {"points": jnp.asarray(pts), "points_valid": jnp.ones((b, p), bool)}
    variables = jax.jit(lambda r: model.init(
        {"params": r, "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, False))(jax.random.PRNGKey(0))

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    bound = model.bind(variables)
    vox_spec, grid, caps = bound.vox_spec, bound.grid, model.backbone_caps

    vox = jax.jit(lambda P, V: voxelize_batch(P, vox_spec, V))
    frame = vox(batch["points"], batch["points_valid"])
    keys = jax.jit(lambda f: keys_from_frame(f, grid))(frame)
    rb_fn = jax.jit(lambda k: build_branch_rulebooks(k, grid, caps,
                                                     dense_tail=True))
    rbs = rb_fn(keys)

    occ0 = int(np.asarray((keys != np.iinfo(np.int32).max).sum(axis=-1)).max())
    occ1 = int(np.asarray(rbs["down2"].out_valid.sum(axis=-1)).max())
    occ2 = int(np.asarray(rbs["down3"].out_valid.sum(axis=-1)).max())
    print(f"occupancy: stage0 {occ0}  stage1 {occ1}  stage2 {occ2}")

    # ---- calibration ------------------------------------------------------
    # gather ns/row on each stage's real table+index shapes (win mode: the
    # production fetch is one (3C)-wide bf16 row per window)
    def calib_gather(v_rows, width_c, n_idx, idx_src):
        tab = jnp.asarray(rng.normal(0, 1, (v_rows, 3 * width_c)), jnp.bfloat16)
        idx = jnp.asarray(idx_src[:n_idx] % v_rows, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        t = timeit(lambda: f(tab, idx), sync, args.iters)
        return t / n_idx * 1e9  # ns per fetched row

    base1 = np.asarray(rbs["subm1"].in_idx[0] if hasattr(rbs["subm1"], "in_idx")
                       else np.arange(occ0))  # fallback: linear
    rand_idx = rng.integers(0, 1 << 30, size=2_000_000)
    ns_row = {}
    for name, v_rows, c in (("s1", max(occ0, 1), 16), ("s2", max(occ1, 1), 32),
                            ("s3", max(occ2, 1), 64)):
        ns_row[name] = calib_gather(v_rows, c, min(9 * v_rows, 1_400_000), rand_idx)
    # LUT rows are 12 B [word, prefix, next]; calibrate on int32 x3 width
    tab_lut = jnp.asarray(rng.integers(0, 1 << 30, (1_500_000, 3)), jnp.int32)
    idx_lut = jnp.asarray(rand_idx[:1_000_000] % 1_500_000, jnp.int32)
    f_lut = jax.jit(lambda t, i: t[i])
    ns_lut = timeit(lambda: f_lut(tab_lut, idx_lut), sync, args.iters) / 1e6 * 1e9 / 1e-0
    ns_lut = ns_lut  # ns per 12-B row at 1M fetches
    # dispatch cost: tiny gather
    tiny_idx = jnp.asarray(rand_idx[:1024] % 1_500_000, jnp.int32)
    t_disp = timeit(lambda: f_lut(tab_lut, tiny_idx), sync, args.iters)
    # sort at voxelizer size (multi-operand carry ~6 channels)
    import jax.lax as lax

    sk = jnp.asarray(rng.integers(0, 1 << 30, 200_000), jnp.int32)
    sv = [jnp.asarray(rng.normal(0, 1, 200_000), jnp.float32) for _ in range(5)]
    f_sort = jax.jit(lambda k, *vs: lax.sort((k,) + vs, num_keys=1))
    t_sort = timeit(lambda: f_sort(sk, *sv), sync, args.iters)
    # dense conv3d measured MXU rate (stage-4 shape)
    g3 = stage_grids(grid)["x_conv4"]
    xd = jnp.asarray(rng.normal(0, 1, (1, g3.nz, g3.ny, g3.nx, 64)), jnp.bfloat16)
    wd = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 64, 128)), jnp.bfloat16)
    f_c3 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16))
    o3 = f_c3(xd, wd)
    t_c3 = timeit(lambda: f_c3(xd, wd), sync, args.iters)
    fl_c3 = 2 * int(np.prod(o3.shape[:4])) * 27 * 64 * 128
    mxu_rate_3d = fl_c3 / t_c3  # achieved FLOP/s on our dense-tail shape
    # conv2d measured rate (BEV shape)
    x2 = jnp.asarray(rng.normal(0, 1, (1, 188, 188, 256)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 1, (3, 3, 256, 256)), jnp.bfloat16)
    f_c2 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16))
    t_c2 = timeit(lambda: f_c2(x2, w2), sync, args.iters)
    mxu_rate_2d = (2 * 188 * 188 * 9 * 256 * 256) / t_c2

    print(f"calibration: gather ns/row s1={ns_row['s1']:.2f} "
          f"s2={ns_row['s2']:.2f} s3={ns_row['s3']:.2f} lut={ns_lut:.2f}  "
          f"dispatch={t_disp*1e6:.1f} us/op  sort200k={t_sort*1e3:.2f} ms  "
          f"conv3d={mxu_rate_3d/1e12:.1f} TF/s ({mxu_rate_3d/PEAK_BF16_FLOPS*100:.0f}% peak)  "
          f"conv2d={mxu_rate_2d/1e12:.1f} TF/s ({mxu_rate_2d/PEAK_BF16_FLOPS*100:.0f}%)")

    # ---- measured stage times (bench_breakdown deltas) --------------------
    t_vox = timeit(lambda: vox(batch["points"], batch["points_valid"]), sync, args.iters)
    t_rb = timeit(lambda: rb_fn(keys), sync, args.iters)

    def bb(feats, k):
        return model.apply(variables, feats, k, False,
                           method=lambda m, f, kk, t: m.backbone(f, kk, t))
    bb_j = jax.jit(bb)
    bb_out = bb_j(frame.features, keys)
    t_bb = timeit(lambda: bb_j(frame.features, keys), sync, args.iters)

    model_norh = model.clone(with_roi_head=False)
    vars_norh = {"params": {k: v for k, v in variables["params"].items() if k != "roi_head"},
                 "batch_stats": variables.get("batch_stats", {})}
    fwd_norh = jax.jit(lambda v, x: model_norh.apply(v, x, False))
    fwd_norh(vars_norh, batch)
    t_norh = timeit(lambda: fwd_norh(vars_norh, batch), sync, args.iters)
    fwd = jax.jit(lambda v, x: model.apply(v, x, False))
    fwd(variables, batch)
    t_fwd = timeit(lambda: fwd(variables, batch), sync, args.iters)
    pred = jax.jit(lambda v, x: model.apply(v, x, method=VoxelRCNN.predict))
    pred(variables, batch)
    t_pred = timeit(lambda: pred(variables, batch), sync, args.iters)

    # ---- analytic floors --------------------------------------------------
    # conv ladder (dense tail): per stage [n_convs, N_out, C, rows/out]
    conv_stages = [
        ("stage1 convs", 5, occ0, 16, ns_row["s1"]),
        ("down2+stage2", 5, occ1, 32, ns_row["s2"]),  # down2 reads s1 table
        ("down3+stage3", 5, occ2, 64, ns_row["s3"]),
    ]
    conv_floor = 0.0
    conv_flops = 0.0
    conv_bytes = 0.0
    for name, n_convs, n_out, c, nsr in conv_stages:
        rows = n_convs * n_out * 9  # win mode: K/3 = 9 rows per output
        fetch_ms = rows * nsr / 1e6
        flops = n_convs * 2 * n_out * 27 * c * c
        gemm_ms = flops / mxu_rate_3d * 1e3
        bn_bytes = n_convs * n_out * c * 2 * 4  # read+write activations
        conv_floor += fetch_ms + gemm_ms + bn_bytes / PEAK_HBM_BPS * 1e3
        conv_flops += flops
        conv_bytes += rows * 3 * c * 2 + bn_bytes
    # dense tail flops (down4 + 4 subm s4 + conv_out on grid3/grid4)
    g4 = stage_grids(grid)["x_conv4"]
    cells4 = g4.nz * g4.ny * g4.nx
    tail_flops = (2 * cells4 * 27 * 64 * 128            # down4
                  + 4 * 2 * cells4 * 27 * 128 * 128     # res4a/b
                  + 2 * (cells4 // 2) * 3 * 128 * 128)  # conv_out z-stride
    tail_ms = tail_flops / mxu_rate_3d * 1e3
    tail_bytes = cells4 * 128 * 2 * 6
    tail_ms += tail_bytes / PEAK_HBM_BPS * 1e3

    # rulebooks: 4 subm books (9 LUT rows/output) + 2 strided builds
    #   (27-tap window LUT walk -> 9 packed rows/output) + LUT builds
    #   (scatter ~V words + cumsum) -- floor as LUT fetches + sorts
    book_rows = (occ0 + occ1 + occ2) * 9 * 2  # subm + strided walks
    books_floor = book_rows * ns_lut / 1e6 + 3 * t_sort * 1e3
    # voxelizer: one 200k multi-operand sort + segment reduce traffic
    vox_floor = t_sort * 1e3 + (p * 5 * 4 * 3) / PEAK_HBM_BPS * 1e3
    # BEV + RPN: conv2d pyramid flops at the measured 2-D MXU rate
    bev_flops = 0
    h = w = 188
    chans = [(256, 128, 1)] + [(128, 128, 1)] * 5
    for cin, cout, s in chans:
        bev_flops += 2 * (h // s) * (w // s) * 9 * cin * cout
    h2 = w2_ = 94
    chans2 = [(128, 256, 2)] + [(256, 256, 1)] * 5
    for cin, cout, s in chans2:
        bev_flops += 2 * h2 * w2_ * 9 * cin * cout
    bev_flops += 2 * 188 * 188 * (256 * 256 + 9 * 64 * 512 // 8)  # deblocks+head approx
    bev_floor = bev_flops / mxu_rate_2d * 1e3 + \
        (188 * 188 * 512 * 2 * 4) / PEAK_HBM_BPS * 1e3
    # RoI queries: 200 rois x 216 grid pts x 135-tap walk / 3-packed
    q_rows = 200 * 216 * 135 // 3 * 2  # two scales
    roi_floor = q_rows * ns_lut / 1e6 + 0.5  # + grouping gathers (est)

    meas = {
        "voxelize": t_vox * 1e3,
        "rulebooks(5 in-path)": t_rb * 1e3,
        "convs (sparse+tail)": (t_bb - t_rb) * 1e3,
        "BEV+RPN": (t_norh - t_bb) * 1e3,
        "RoI head": (t_fwd - t_norh) * 1e3,
        "decode+NMS": (t_pred - t_fwd) * 1e3,
    }
    floors = {
        "voxelize": vox_floor,
        "rulebooks(5 in-path)": books_floor,
        "convs (sparse+tail)": conv_floor + tail_ms,
        "BEV+RPN": bev_floor,
        "RoI head": roi_floor,
        "decode+NMS": float("nan"),
    }
    print(f"\n{'stage':24s} {'measured':>9s} {'floor':>8s} {'residual':>9s}")
    for k in meas:
        f = floors[k]
        res = meas[k] - f if np.isfinite(f) else float("nan")
        print(f"{k:24s} {meas[k]:8.1f}ms {f:7.1f}ms {res:8.1f}ms")
    total = t_pred * 1e3
    frame_flops = conv_flops + tail_flops + bev_flops
    frame_bytes = conv_bytes + tail_bytes + book_rows * 12
    print(f"\nframe: {total:.1f} ms  fps {1e3/total:.2f}")
    print(f"MFU: {frame_flops / (total/1e3) / PEAK_BF16_FLOPS * 100:.2f}%  "
          f"({frame_flops/1e9:.1f} GFLOP/frame)")
    print(f"HBM util (counted bytes only): "
          f"{frame_bytes / (total/1e3) / PEAK_HBM_BPS * 100:.2f}%  "
          f"({frame_bytes/1e6:.0f} MB/frame)")
    print(f"conv fetch transactions: "
          f"{sum(n*o*9 for _, n, o, _, _ in conv_stages)/1e6:.2f}M rows; "
          f"book LUT rows {book_rows/1e6:.2f}M; roi {q_rows/1e6:.2f}M")


if __name__ == "__main__":
    main()
