"""Probe: isolate the rng-dependent fwd-only NaN (VERDICT r4 weak #3).

exp_r4_nan reproduced loss=nan at batch-4 bench scale on specific sampling
rng keys. This round the loss path gained double-where input sanitization
(loss.sanitize_boxes, commit r5) -- this probe re-runs the exact repro with
the per-input NaN forensics counters enabled (ROI_HEAD debug_forensics) to
(a) verify the fix and (b) attribute any survivor to its input.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r5_nan.py [--cpu]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--keys", type=int, nargs="*", default=[7, 8, 0, 1, 2])
    ap.add_argument("--grad", action="store_true",
                    help="also check grad-norm finiteness per key")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.detector import VoxelRCNN
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    b, p = args.batch, args.points
    rng = np.random.default_rng(0)
    pts = np.stack([make_lidar_frame(rng, p)[0] for _ in range(b)])
    n_gt = 64
    gt = np.zeros((b, n_gt, 8), np.float32)
    gt[..., :2] = rng.uniform(-70, 70, (b, n_gt, 2))
    gt[..., 2] = rng.uniform(-1, 2, (b, n_gt))
    gt[..., 3:6] = rng.uniform(1.5, 5, (b, n_gt, 3))
    gt[..., 6] = rng.uniform(-3, 3, (b, n_gt))
    gt[..., 7] = rng.integers(1, 4, (b, n_gt))
    batch = {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((b, p), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_valid": jnp.ones((b, n_gt), bool),
        "css_score": jnp.asarray(
            rng.uniform(0.3, 1, (b, n_gt)).astype(np.float32)),
        "proto_group_id": jnp.asarray(
            rng.integers(0, 50, (b, n_gt)).astype(np.int32)),
    }
    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=90_000,
        backbone_caps=(80_000, 48_000, 24_000, 20_000),
        mm=True, remat=False,
        roi_head_cfg={"debug_forensics": True},
    )
    variables = jax.jit(lambda r: model.init(
        {"params": r, "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, True))(jax.random.PRNGKey(0))

    @jax.jit
    def fwd(v, key):
        (loss, tb), _ = model.apply(
            v, {**batch, "cur_it": jnp.zeros((), jnp.float32)},
            method=VoxelRCNN.loss_step, mutable=["batch_stats"],
            rngs={"sampling": key, "dropout": key},
        )
        tb["total_loss"] = loss
        return tb

    @jax.jit
    def gnorm(v, key):
        import optax

        def loss_fn(params):
            (loss, _), _ = model.apply(
                {**v, "params": params},
                {**batch, "cur_it": jnp.zeros((), jnp.float32)},
                method=VoxelRCNN.loss_step, mutable=["batch_stats"],
                rngs={"sampling": key, "dropout": key},
            )
            return loss

        return optax.global_norm(jax.grad(loss_fn)(v["params"]))

    for k in args.keys:
        tb = fwd(variables, jax.random.PRNGKey(k))
        flat = {kk: float(np.asarray(vv)) for kk, vv in tb.items()
                if np.ndim(vv) == 0}
        bad = {kk: vv for kk, vv in flat.items() if not np.isfinite(vv)}
        nonzero_forensics = {kk: vv for kk, vv in flat.items()
                             if kk.startswith("nonfinite_") and vv > 0}
        line = (f"key {k}: total={flat.get('total_loss'):.4g} "
                f"nonfinite={bad if bad else 'none'} "
                f"forensics>0={nonzero_forensics if nonzero_forensics else 'none'}")
        if args.grad:
            g = float(np.asarray(gnorm(variables, jax.random.PRNGKey(k))))
            line += f" gnorm={g:.4g}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
