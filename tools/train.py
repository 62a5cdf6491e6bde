"""Training CLI (parity with reference tools/train.py flags & flow).

Usage:
  python tools/train.py --cfg_file tools/cfgs/models/voxel_rcnn_cproto_center.yaml

Flow: cfg parse -> dataloader -> build_network -> adam_onecycle -> auto-resume
-> pjit data-parallel train loop over the device mesh -> per-epoch checkpoint
rotation -> optional eval of the final checkpoints (reference train.py:56-198).
"""
from __future__ import annotations

import argparse
import datetime
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--batch_size", type=int, default=None, help="global batch size")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--extra_tag", default="default")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--pretrained_model", default=None)
    p.add_argument("--fix_random_seed", action="store_true")
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--max_ckpt_save_num", type=int, default=30)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--debug_steps", type=int, default=0,
                   help="stop after N optimizer steps (smoke runs)")
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--eval_after", type=int, default=0,
                   help="evaluate the last N checkpoints after training (reference repeat_eval_ckpt)")
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    return p.parse_args(argv)


def device_batch(batch):
    """Host batch -> device arrays (drop metadata)."""
    import jax.numpy as jnp

    keep = ("points", "points_valid", "points1", "points1_valid",
            "gt_boxes", "gt_valid", "css_score")
    return {k: jnp.asarray(batch[k]) for k in keep if k in batch}


def main(argv=None, dataset=None):
    args = parse_args(argv)

    from cpd_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    from cpd_tpu.datasets import build_dataloader
    from cpd_tpu.models import build_network
    from cpd_tpu.parallel import build_optimizer, init_state, make_mesh, make_train_step
    from cpd_tpu.utils.checkpoint import auto_resume, load_params_from_file, save_checkpoint
    from cpd_tpu.utils.common import MetricsLogger, PhaseTimer, create_logger, set_random_seed

    import jax

    from cpd_tpu.utils.common import enable_compile_cache
    enable_compile_cache()

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    n_devices = len(jax.devices())
    batch_size = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU) * n_devices
    batch_size = max(batch_size - batch_size % n_devices, n_devices)
    epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)

    out_dir = Path(args.output_dir or f"output/{cfg.TAG}/{args.extra_tag}")
    ckpt_dir = out_dir / "ckpt"
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(out_dir / "log_train.txt")
    logger.info(f"devices: {jax.devices()}  global batch: {batch_size}")
    if args.fix_random_seed:
        set_random_seed(args.seed)

    train_set, train_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH"), workers=args.workers,
        training=True, seed=args.seed, dataset=dataset,
    )
    logger.info(f"train samples: {len(train_set)}  steps/epoch: {len(train_loader)}")
    if len(train_set) == 0:
        raise SystemExit(
            f"dataset '{cfg.DATA_CONFIG.get('DATASET')}' is empty -- no processed "
            f"data under DATA_PATH={cfg.DATA_CONFIG.get('DATA_PATH')!r}. Build infos "
            "first (see cpd_tpu/datasets/waymo_unsupervised.py builders) or pass a "
            "dataset with samples."
        )

    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.DATA_CONFIG)
    total_steps = max(len(train_loader) * epochs, 1)
    tx = build_optimizer(cfg.OPTIMIZATION, total_steps)

    first_batch = device_batch(next(iter(train_loader)))
    state = init_state(model, first_batch, tx, rng=jax.random.PRNGKey(args.seed))
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"model params: {n_params / 1e6:.2f}M")

    if args.pretrained_model:
        state = load_params_from_file(state, args.pretrained_model, logger)
    start_epoch = 0
    if args.ckpt:
        from cpd_tpu.utils.checkpoint import load_checkpoint

        payload = load_checkpoint(args.ckpt, state)
        state = state.replace(params=payload["params"], batch_stats=payload["batch_stats"],
                              opt_state=payload["opt_state"],
                              step=np.asarray(payload["step"], np.int32))
        start_epoch = int(payload["epoch"]) + 1
    else:
        state, start_epoch = auto_resume(ckpt_dir, state)
        if start_epoch:
            logger.info(f"auto-resumed from epoch {start_epoch - 1}")

    mesh = make_mesh()
    train_step = make_train_step(model, mesh)
    metrics = MetricsLogger(out_dir)
    timer = PhaseTimer()
    rng = jax.random.PRNGKey(args.seed)

    it = int(state.step)
    stop = False
    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        if hasattr(train_set, "set_epoch"):
            train_set.set_epoch(epoch)
        t_epoch = time.time()
        with mesh:
            for batch in train_loader:
                with timer.phase("h2d"):
                    db = device_batch(batch)
                with timer.phase("step"):
                    state, tb = train_step(state, db, rng)
                it += 1
                if it % args.log_every == 0 or args.debug_steps:
                    tb_host = {k: float(v) for k, v in tb.items()}
                    logger.info(
                        f"epoch {epoch} it {it} " +
                        " ".join(f"{k}={v:.4f}" for k, v in sorted(tb_host.items()))
                    )
                    metrics.log(it, tb_host)
                if args.debug_steps and it >= args.debug_steps:
                    stop = True
                    break
        save_checkpoint(ckpt_dir, state, epoch, args.max_ckpt_save_num)
        logger.info(
            f"epoch {epoch} done in {time.time() - t_epoch:.1f}s; "
            f"phase means: { {k: round(v, 4) for k, v in timer.summary().items()} }"
        )
        if stop:
            break
    metrics.close()
    logger.info("training complete")
    if args.eval_after:
        # reference behavior: evaluate the last N epochs' checkpoints
        # (train.py:181-195 -> repeat_eval_ckpt)
        from cpd_tpu.utils.checkpoint import list_checkpoints
        from tools import test as test_cli

        ckpts = list_checkpoints(ckpt_dir)[-args.eval_after:]
        for ep, path in ckpts:
            logger.info(f"post-train eval of epoch {ep}")
            test_cli.main([
                "--cfg_file", args.cfg_file,
                "--output_dir", str(out_dir / f"eval_epoch_{ep}"),
                "--ckpt", str(path),
            ])
    return state


if __name__ == "__main__":
    main()
