"""Training-step wall-clock benchmark at reference-parity scale.

Batch 4, MM siamese branch + proto losses, 200k-point frames, 150k voxel
cap on one chip -- the configuration whose reference counterpart is
"batch 4/GPU" training (BASELINE.md). Prints seconds/step and
frames/sec/chip after compile + warmup.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_step.py [--batch 4] [--remat {on,off}]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--remat", choices=("on", "off", "roi-only"), default="on")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-roi", action="store_true", help="drop the RoI head")
    ap.add_argument("--no-mm", action="store_true", help="drop the MM siamese branch")
    ap.add_argument("--fwd-only", action="store_true",
                    help="time loss_step forward without gradients")
    ap.add_argument("--dense-tail", action="store_true",
                    help="run stage 4 + conv_out as dense MXU conv3d (both "
                         "branches); drops the stage-4 rulebooks + transposes")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.detector import VoxelRCNN
    from cpd_tpu.parallel.trainer import build_optimizer, make_train_step
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        # beam-structured frames + audited caps, matching bench.py (the old
        # uniform scatter dilated down2 ABOVE stage-0 occupancy -- unrealistic)
        max_voxels=90_000,
        backbone_caps=(80_000, 48_000, 24_000, 20_000),
        mm=not args.no_mm,
        dense_tail=args.dense_tail,
        remat=args.remat != "off",
        remat_backbone=(False if args.remat == "roi-only" else None),
        with_roi_head=not args.no_roi,
        num_rois=500,
        roi_per_image=130,
    )
    b, p = args.batch, args.points
    rng = np.random.default_rng(0)
    def mk_points():
        return np.stack([make_lidar_frame(rng, p)[0] for _ in range(b)])

    n_gt = 64
    gt = np.zeros((b, n_gt, 8), np.float32)
    gt[..., :2] = rng.uniform(-70, 70, (b, n_gt, 2))
    gt[..., 2] = rng.uniform(-1, 2, (b, n_gt))
    gt[..., 3:6] = rng.uniform(1, 5, (b, n_gt, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, n_gt))
    gt[..., 7] = rng.integers(1, 4, (b, n_gt))
    batch = {
        "points": jnp.asarray(mk_points()),
        "points_valid": jnp.ones((b, p), bool),
        "points1": jnp.asarray(mk_points()),
        "points1_valid": jnp.ones((b, p), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_valid": jnp.ones((b, n_gt), bool),
        "css_score": jnp.asarray(rng.uniform(0.3, 1.0, (b, n_gt)).astype(np.float32)),
    }
    tx = build_optimizer({"OPTIMIZER": "adam_onecycle", "LR": 0.003}, 1000)
    # jit the flax init: eager init dispatches ~10^4 small ops over the axon
    # tunnel (one RPC each) -- many minutes at batch-4 Waymo scale
    import time as _t
    from flax.core import FrozenDict

    from cpd_tpu.parallel.trainer import TrainState
    _t0 = _t.perf_counter()
    init_jit = jax.jit(lambda r: model.init(
        {"params": r, "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, True))
    _vars = init_jit(jax.random.PRNGKey(0))
    np.asarray(jax.tree_util.tree_leaves(_vars)[0].ravel()[0])
    print(f"init: {_t.perf_counter() - _t0:.0f}s")
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=_vars["params"],
        batch_stats=_vars.get("batch_stats", FrozenDict()),
        opt_state=tx.init(_vars["params"]), tx=tx, apply_fn=model.apply,
    )
    if args.fwd_only:
        def fwd_step(state, b, rng):
            (loss, tb), _ = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                {**b, "cur_it": jnp.zeros((), jnp.float32)},
                method=type(model).loss_step, mutable=["batch_stats"],
                rngs={"sampling": rng, "dropout": rng},
            )
            tb["total_loss"] = loss
            tb.setdefault("grad_norm", jnp.zeros(()))
            tb.setdefault("skipped_nonfinite", jnp.zeros(()))
            return state, tb
        train_step = jax.jit(fwd_step)
    else:
        train_step = make_train_step(model, donate=False)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    t0 = time.perf_counter()
    state, tb = train_step(state, batch, jax.random.PRNGKey(7))
    sync(tb)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    state, tb = train_step(state, batch, jax.random.PRNGKey(8))
    sync(tb)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, tb = train_step(state, batch, jax.random.PRNGKey(i))
    sync(tb)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step: {dt:.2f} s/step  |  {b / dt:.3f} frames/s/chip  "
          f"(batch {b}, remat {args.remat})")
    print(f"loss={float(tb['total_loss']):.3f} grad_norm={float(tb['grad_norm']):.3f} "
          f"skipped={float(tb['skipped_nonfinite'])}")


if __name__ == "__main__":
    main()
