"""Round-3 training-step attribution: where do the 4.8 s/step live?

Runs a ladder of train-step variants IN ONE PROCESS (one TPU claim, shared
compile cache): fwd-only vs full grad, no-roi / no-mm ablations, dense tail.
Order is smallest-memory-first so an OOM late in the ladder still leaves the
earlier numbers on stdout.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_r3_train_attrib.py [--batch 4]
"""
import argparse
import time
import traceback

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpd_tpu.models.detector import VoxelRCNN
    from cpd_tpu.parallel.trainer import build_optimizer, make_train_step
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
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

    base = dict(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=90_000,
        backbone_caps=(80_000, 48_000, 24_000, 20_000),
        num_rois=500,
        roi_per_image=130,
    )
    variants = [
        # (name, model kwargs, fwd_only)
        ("fwd_only", dict(remat=False), True),
        ("fwd_only_dense_tail", dict(remat=False, dense_tail=True), True),
        ("no_roi", dict(remat=False, with_roi_head=False), False),
        ("no_mm", dict(remat=False, mm=False), False),
        ("dense_tail", dict(remat=False, dense_tail=True), False),
        ("full_remat_off", dict(remat=False), False),
        ("full_remat_on", dict(remat=True), False),
    ]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    for name, kw, fwd_only in variants:
        try:
            model = VoxelRCNN(**base, **kw)
            tx = build_optimizer({"OPTIMIZER": "adam_onecycle", "LR": 0.003}, 1000)
            # jit the flax init: eager init dispatches ~10^4 small ops over
            # the axon tunnel (one RPC each) -- many minutes per variant
            t0 = time.perf_counter()
            init_jit = jax.jit(lambda r: model.init(
                {"params": r, "sampling": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)}, batch, True))
            variables = init_jit(jax.random.PRNGKey(0))
            sync(variables)
            print(f"{name:>22s}: init {time.perf_counter() - t0:.0f}s", flush=True)
            from cpd_tpu.parallel.trainer import TrainState
            from flax.core import FrozenDict
            state = TrainState(
                step=jnp.zeros((), jnp.int32), params=variables["params"],
                batch_stats=variables.get("batch_stats", FrozenDict()),
                opt_state=tx.init(variables["params"]), tx=tx,
                apply_fn=model.apply,
            )
            if fwd_only:
                def fwd_step(state, bb, rng_):
                    (loss, tb), _ = state.apply_fn(
                        {"params": state.params, "batch_stats": state.batch_stats},
                        {**bb, "cur_it": jnp.zeros((), jnp.float32)},
                        method=type(model).loss_step, mutable=["batch_stats"],
                        rngs={"sampling": rng_, "dropout": rng_},
                    )
                    tb["total_loss"] = loss
                    return state, tb
                step = jax.jit(fwd_step)
            else:
                step = make_train_step(model, donate=False)
            t0 = time.perf_counter()
            state, tb = step(state, batch, jax.random.PRNGKey(7))
            sync(tb)
            compile_t = time.perf_counter() - t0
            state, tb = step(state, batch, jax.random.PRNGKey(8))
            sync(tb)
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, tb = step(state, batch, jax.random.PRNGKey(i))
            sync(tb)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:>22s}: {dt:6.2f} s/step  ({b / dt:.3f} f/s/chip; "
                  f"compile {compile_t:.0f}s, loss {float(tb['total_loss']):.2f})",
                  flush=True)
            bad = {kk: float(np.asarray(vv)) for kk, vv in tb.items()
                   if np.ndim(vv) == 0 and not np.isfinite(float(np.asarray(vv)))}
            if bad:
                print(f"{name:>22s}: NONFINITE terms {bad}", flush=True)
            diags = {kk: float(np.asarray(vv)) for kk, vv in tb.items()
                     if kk.startswith("nonfinite_")}
            if any(diags.values()):
                print(f"{name:>22s}: forensics {diags}", flush=True)
            del state, step
        except Exception:
            print(f"{name:>22s}: FAILED", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
