"""Training-at-scale evidence run (VERDICT r4 weak #4 / next-round #4).

Flagship cproto detector (MM siamese + proto losses) at bench scale
(200k-pt beam frames, 90k voxel cap, audited ladder caps), batch 4,
N steps on the chip, cycling over a small pool of synthetic batches.
Records the loss trajectory, grad norms, `skipped_nonfinite` total and
steady-state s/step -- the strongest "it actually trains" proxy available
without real Waymo data in the image.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r5_train500.py \
      [--steps 400] [--batch 4] [--pool 8]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--pool", type=int, default=8,
                    help="distinct synthetic batches cycled over")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="graft-entry _TINY config (CPU-feasible fallback "
                         "evidence when the chip is unavailable)")
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.detector import VoxelRCNN
    from cpd_tpu.parallel.trainer import (build_optimizer, init_state,
                                          make_train_step)
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    b, p = args.batch, args.points
    rng = np.random.default_rng(0)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        pts = np.stack([make_lidar_frame(r, p)[0] for _ in range(b)])
        n_gt = 64
        gt = np.zeros((b, n_gt, 8), np.float32)
        gt[..., :2] = r.uniform(-70, 70, (b, n_gt, 2))
        gt[..., 2] = r.uniform(-1, 2, (b, n_gt))
        gt[..., 3:6] = r.uniform(1.5, 5, (b, n_gt, 3))
        gt[..., 6] = r.uniform(-3, 3, (b, n_gt))
        gt[..., 7] = r.integers(1, 4, (b, n_gt))
        return {
            "points": jnp.asarray(pts),
            "points_valid": jnp.ones((b, p), bool),
            "points1": jnp.asarray(pts + 0.02),
            "points1_valid": jnp.ones((b, p), bool),
            "gt_boxes": jnp.asarray(gt),
            "gt_valid": jnp.ones((b, n_gt), bool),
            "css_score": jnp.asarray(
                r.uniform(0.3, 1, (b, n_gt)).astype(np.float32)),
            "proto_group_id": jnp.asarray(
                r.integers(0, 50, (b, n_gt)).astype(np.int32)),
        }

    if args.tiny:
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __graft_entry__ as g

        pool = [g._make_batch(b=args.batch, p=2048, seed=s)
                for s in range(args.pool)]
        model = VoxelRCNN(**{**g._TINY, "mm": True})
    else:
        pool = [make_batch(s) for s in range(args.pool)]
        model = VoxelRCNN(
            num_classes=3,
            point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
            voxel_size=(0.1, 0.1, 0.15),
            max_voxels=90_000,
            backbone_caps=(80_000, 48_000, 24_000, 20_000),
            mm=True, remat=False,
        )
    # the reference schedule: adam_onecycle, LR 0.003, clip 32
    tx = build_optimizer({"OPTIMIZER": "adam_onecycle", "LR": 0.003,
                          "GRAD_NORM_CLIP": 32}, args.steps)
    t0 = time.time()
    # jitted init on a batch-1 slice: eager flax init dispatches thousands
    # of ops over the axon tunnel (bench.py learned this the hard way);
    # param shapes depend only on channels, not batch.
    from cpd_tpu.parallel.trainer import TrainState

    init_batch = {k: v[:1] for k, v in pool[0].items()}
    variables = jax.jit(lambda r: model.init(
        {"params": r, "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, init_batch, True,
    ))(jax.random.PRNGKey(0))
    try:
        from flax.core import FrozenDict
    except ImportError:  # flax >= 0.8 plain dicts
        FrozenDict = dict
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
    del init_state  # silence unused-import linters; eager path intentionally bypassed
    print(f"init: {time.time() - t0:.1f}s", flush=True)
    step = make_train_step(model, mesh=None, donate=True)
    key = jax.random.PRNGKey(42)

    losses, gnorms, skipped = [], [], 0.0
    t_first = None
    t_loop = None
    for it in range(args.steps):
        state, tb = step(state, pool[it % args.pool], key)
        if it == 0:
            loss0 = float(np.asarray(tb["total_loss"])) if "total_loss" in tb \
                else float(np.asarray(tb.get("loss", np.nan)))
            t_first = time.time()
            print(f"step 0 done (compile+run {t_first - t0:.1f}s)", flush=True)
            t_loop = time.time()
        loss = float(np.asarray(tb.get("total_loss", tb.get("loss", np.nan))))
        g = float(np.asarray(tb["grad_norm"]))
        losses.append(loss)
        gnorms.append(g)
        skipped += float(np.asarray(tb["skipped_nonfinite"]))
        if it % args.log_every == 0 or it == args.steps - 1:
            print(f"it {it:4d}  loss {loss:9.4f}  gnorm {g:9.3f}  "
                  f"skipped {int(skipped)}", flush=True)
    dt = (time.time() - t_loop) / max(args.steps - 1, 1)
    first10 = float(np.nanmean(losses[:10]))
    last10 = float(np.nanmean(losses[-10:]))
    print(f"\nsteps {args.steps}  s/step {dt:.3f}  "
          f"loss first10 {first10:.3f} -> last10 {last10:.3f}  "
          f"skipped_nonfinite {int(skipped)}  "
          f"nan_losses {int(np.sum(~np.isfinite(losses)))}", flush=True)


if __name__ == "__main__":
    main()
