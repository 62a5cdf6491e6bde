"""Per-stage inference timing: voxelize / rulebooks / backbone / BEV+RPN /
proposal NMS / RoI head, each as its own jit with forced readback.

Stage boundaries mean some work is duplicated between jits (e.g. the full
predict includes everything); the per-stage deltas are what matter.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_breakdown.py
"""
import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--uniform", action="store_true",
                    help="old uniform-box frame instead of the lidar model")
    ap.add_argument("--max-voxels", type=int, default=90_000)
    ap.add_argument("--caps", type=int, nargs=4, default=(80_000, 48_000, 24_000, 20_000),
                    help="audited beam-structured-frame caps (bench.py docstring)")
    ap.add_argument("--dense-tail", action="store_true",
                    help="stage 4 + conv_out as dense MXU conv3d")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from cpd_tpu.models.detector import VoxelRCNN, keys_from_frame
    from cpd_tpu.models.backbone3d import build_branch_rulebooks
    from cpd_tpu.ops.voxelizer import voxelize_batch
    from cpd_tpu.utils.synthetic import make_lidar_frame

    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=args.max_voxels,
        backbone_caps=tuple(args.caps),
        mm=False,
        num_rois=500,
        dense_tail=args.dense_tail,
        num_rois_test=200,
        roi_per_image=130,
    )
    b, p = args.batch, 200_000
    rng = np.random.default_rng(0)
    if args.uniform:
        pts = np.concatenate(
            [
                rng.uniform(-74, 74, (b, p, 2)),
                rng.uniform(-2, 4, (b, p, 1)),
                rng.uniform(0, 1, (b, p, 2)),
            ],
            axis=-1,
        ).astype(np.float32)
    else:
        pts = np.stack([make_lidar_frame(rng, p)[0] for _ in range(b)])
    batch = {"points": jnp.asarray(pts), "points_valid": jnp.ones((b, p), bool)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, False)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    bound = model.bind(variables)
    vox_spec, grid, caps = bound.vox_spec, bound.grid, model.backbone_caps

    vox = jax.jit(lambda pts, pv: voxelize_batch(pts, vox_spec, pv))
    frame = vox(batch["points"], batch["points_valid"])
    t_vox = timeit(lambda: vox(batch["points"], batch["points_valid"]), sync, args.iters)
    print(f"voxelize:            {t_vox*1e3:8.1f} ms")

    keys_fn = jax.jit(lambda f: keys_from_frame(f, grid))
    keys = keys_fn(frame)
    rb_fn = jax.jit(lambda k: build_branch_rulebooks(k, grid, caps))
    rbs = rb_fn(keys)
    t_rb = timeit(lambda: rb_fn(keys), sync, args.iters)
    print(f"rulebooks (all 8):   {t_rb*1e3:8.1f} ms")

    # backbone forward (rulebooks inside, matches predict's true content)
    def bb(feats, keys):
        return model.apply(variables, feats, keys, False,
                           method=lambda m, f, k, t: m.backbone(f, k, t))
    bb_j = jax.jit(bb)
    bb_out = bb_j(frame.features, keys)
    bb_out = jax.tree_util.tree_map(jnp.asarray, bb_out)
    t_bb = timeit(lambda: bb_j(frame.features, keys), sync, args.iters)
    print(f"backbone (+rbs):     {t_bb*1e3:8.1f} ms   (minus rulebooks: {(t_bb-t_rb)*1e3:.1f})")

    # full forward without RoI head
    model_norh = model.clone(with_roi_head=False)
    vars_norh = {"params": {k: v for k, v in variables["params"].items() if k != "roi_head"},
                 "batch_stats": variables.get("batch_stats", {})}
    fwd_norh = jax.jit(lambda v, x: model_norh.apply(v, x, False))
    o_norh = fwd_norh(vars_norh, batch)
    t_norh = timeit(lambda: fwd_norh(vars_norh, batch), sync, args.iters)
    print(f"fwd to proposals:    {t_norh*1e3:8.1f} ms   (minus backbone: {(t_norh-t_bb)*1e3:.1f})")

    fwd = jax.jit(lambda v, x: model.apply(v, x, False))
    o = fwd(variables, batch)
    t_fwd = timeit(lambda: fwd(variables, batch), sync, args.iters)
    print(f"full fwd (+roihead): {t_fwd*1e3:8.1f} ms   (roi head: {(t_fwd-t_norh)*1e3:.1f})")

    pred = jax.jit(lambda v, x: model.apply(v, x, method=VoxelRCNN.predict))
    o = pred(variables, batch)
    t_pred = timeit(lambda: pred(variables, batch), sync, args.iters)
    print(f"predict (+postNMS):  {t_pred*1e3:8.1f} ms   (post nms: {(t_pred-t_fwd)*1e3:.1f})")
    occ0 = int(np.asarray((keys != np.iinfo(np.int32).max).sum(axis=-1)).max())
    occ = {name: int(np.asarray(rbs[name].out_valid.sum(axis=-1)).max())
           for name in ("down2", "down3", "down4", "conv_out")}
    print(f"occupancy: stage0 {occ0}/{model.max_voxels}, {occ} / caps {model.backbone_caps}")
    print(f"fps: {b/t_pred:.3f}  (batch {b})")

    # ---- roi-head internals -------------------------------------------------
    from cpd_tpu.models.roi_head import compute_pool_queries
    from cpd_tpu.models.backbone3d import stage_grids
    import numpy as _np

    scale_grids = stage_grids(grid)
    n_rois = model.num_rois_test
    rng2 = _np.random.default_rng(1)
    rois = _np.zeros((b, n_rois, 7), _np.float32)
    rois[..., :2] = rng2.uniform(-70, 70, (b, n_rois, 2))
    rois[..., 2] = rng2.uniform(-1, 2, (b, n_rois))
    rois[..., 3:6] = rng2.uniform(1, 5, (b, n_rois, 3))
    rois[..., 6] = rng2.uniform(-3, 3, (b, n_rois))
    rois = jnp.asarray(rois)
    sf = {k: (v[0], v[1]) for k, v in bb_out.items()
          if k.startswith(("x_conv3", "x_conv4"))}
    specs = (("x_conv3", 4, ((2, 2, 2), 0.4), ((4, 4, 4), 0.8)),
             ("x_conv4", 8, ((2, 2, 2), 0.8), ((4, 4, 4), 1.6)))
    q_fn = jax.jit(lambda r, s: compute_pool_queries(
        r, s, scale_grids, specs, model.voxel_size, model.point_cloud_range,
        model.roi_grid_size, 16, ""))
    qr = q_fn(rois, sf)
    t_q = timeit(lambda: q_fn(rois, sf), sync, args.iters)
    print(f"  roi voxel queries: {t_q*1e3:8.1f} ms")

    # ---- dense-head decode + proposal NMS ----------------------------------
    hp = jax.tree_util.tree_map(jnp.asarray, o_norh["head_preds"])
    gen = jax.jit(lambda v, h: model.apply(
        v, h, method=lambda m, hh: m.dense_head.generate_predicted_boxes(
            hh, k=500, score_thresh=0.1,
            nms_cfg={"NMS_THRESH": 0.8, "NMS_PRE_MAXSIZE": 4096,
                     "NMS_POST_MAXSIZE": n_rois},
            post_max_size=n_rois)))
    g = gen(variables, hp)
    t_gen = timeit(lambda: gen(variables, hp), sync, args.iters)
    print(f"  decode+prop NMS:   {t_gen*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
