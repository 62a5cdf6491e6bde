"""Prewarm the persistent XLA compile cache for a config's train/eval programs.

The unrolled batch-4 train program compiles in ~24 min on the remote TPU
service (STATUS.md r4) -- one-time per shape, but a cold cache pays it at
the first real step of every campaign. This tool compiles the exact
programs out-of-band (AOT ``.lower().compile()``; nothing is executed, no
data needed -- a synthetic batch supplies the SHAPES) so the real run's
first step is warm-cache (< 1 min).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/prewarm.py \
      --cfg_file tools/cfgs/models/voxel_rcnn_cproto_center.yaml \
      --batch_size 4 [--points 200000] [--eval] [--no-train]

The shapes must match the later run: batch size, point cap, and the model
config's voxel/backbone caps (all read from the cfg) — AND ``--total_steps``
must match the real run's ``len(train_loader) * epochs``: the onecycle
schedule's constants are baked into the compiled HLO, so a program
prewarmed for a different step count is a guaranteed cache MISS (measured:
an otherwise-identical rerun with a different --steps recompiled for
487 s where the exact-match rerun hit the cache and reached its first
step in 158 s vs 684 s cold).
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--points", type=int, default=200_000,
                   help="per-frame point cap (match the dataset processor)")
    p.add_argument("--eval", action="store_true",
                   help="also prewarm the eval/predict program (batch 1)")
    p.add_argument("--no-train", action="store_true")
    p.add_argument("--total_steps", type=int, default=1000,
                   help="MUST equal the real run's len(train_loader)*epochs: "
                        "the onecycle schedule constants are baked into the "
                        "compiled program (a mismatch is a cache miss)")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def synthetic_batch(b, p, n_gt=64, seed=0, with_proto=True, pc_range=None):
    import jax.numpy as jnp

    from cpd_tpu.utils.synthetic import make_lidar_frame

    rng = np.random.default_rng(seed)
    pts = np.stack([make_lidar_frame(rng, p)[0] for _ in range(b)])
    lo = np.asarray(pc_range[:3]) if pc_range is not None else np.array([-70, -70, -1])
    hi = np.asarray(pc_range[3:]) if pc_range is not None else np.array([70, 70, 2])
    gt = np.zeros((b, n_gt, 8), np.float32)
    gt[..., :3] = rng.uniform(lo * 0.9, hi * 0.9, (b, n_gt, 3))
    gt[..., 3:6] = rng.uniform(1.5, 5, (b, n_gt, 3))
    gt[..., 6] = rng.uniform(-3, 3, (b, n_gt))
    gt[..., 7] = rng.integers(1, 4, (b, n_gt))
    batch = {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((b, p), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_valid": jnp.ones((b, n_gt), bool),
        "css_score": jnp.asarray(rng.uniform(0.3, 1, (b, n_gt)).astype(np.float32)),
        "proto_group_id": jnp.asarray(rng.integers(0, 50, (b, n_gt)).astype(np.int32)),
    }
    if with_proto:
        batch["points1"] = batch["points"]
        batch["points1_valid"] = batch["points_valid"]
    return batch


def main(argv=None):
    args = parse_args(argv)

    import jax

    from cpd_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    from cpd_tpu.models import build_network
    from cpd_tpu.parallel import build_optimizer, init_state, make_mesh, make_train_step
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.DATA_CONFIG)
    pc_range = cfg.DATA_CONFIG.get("POINT_CLOUD_RANGE")
    mm = bool(getattr(model, "mm", False))

    if not args.no_train:
        batch = synthetic_batch(args.batch_size, args.points, seed=args.seed,
                                with_proto=mm, pc_range=pc_range)
        tx = build_optimizer(cfg.OPTIMIZATION, args.total_steps)
        t0 = time.time()
        # jitted init on a batch-1 slice: eager flax init dispatches
        # thousands of ops one-by-one over the axon tunnel; param shapes
        # depend only on channels, so the slice is equivalent (bench.py)
        import jax.numpy as jnp

        from cpd_tpu.parallel.trainer import TrainState
        init_batch = {k: v[:1] for k, v in batch.items()}
        variables = jax.jit(lambda r: model.init(
            {"params": r, "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, init_batch, True,
        ))(jax.random.PRNGKey(args.seed))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            tx=tx,
            apply_fn=model.apply,
        )
        del init_state  # eager path intentionally bypassed
        print(f"init: {time.time() - t0:.1f}s", flush=True)
        mesh = make_mesh()
        step = make_train_step(model, mesh)
        t0 = time.time()
        lowered = step.lower(state, batch, jax.random.PRNGKey(0))
        print(f"train lower: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        lowered.compile()
        print(f"train compile: {time.time() - t0:.1f}s "
              f"(cache warm for batch={args.batch_size}, points={args.points})",
              flush=True)

    if args.eval:
        from cpd_tpu.models.detector import VoxelRCNN

        ebatch = synthetic_batch(1, args.points, seed=args.seed,
                                 with_proto=False, pc_range=pc_range)
        ebatch = {k: v for k, v in ebatch.items()
                  if k in ("points", "points_valid")}
        variables = jax.jit(lambda r: model.init(
            {"params": r, "sampling": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, ebatch, False))(
                 jax.random.PRNGKey(0))
        predict = jax.jit(lambda v, x: model.apply(
            v, x, method=type(model).predict))
        t0 = time.time()
        predict.lower(variables, ebatch).compile()
        print(f"eval compile: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
