"""Evaluation CLI (parity with reference tools/test.py + eval_utils).

Evaluates one checkpoint (--ckpt) or polls the training ckpt dir for new
epochs (repeat mode, reference test.py:85 repeat_eval_ckpt).
"""
from __future__ import annotations

import argparse
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", required=True)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--extra_tag", default="default")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--eval_all", action="store_true", help="poll + eval every new ckpt")
    p.add_argument("--max_waiting_mins", type=int, default=30)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--test_iter", type=int, default=0, help="TTA transform index")
    p.add_argument("--debug_steps", type=int, default=0)
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    return p.parse_args(argv)


def eval_one_checkpoint(model, state, loader, dataset, class_names, logger,
                        out_dir, debug_steps=0):
    """The eval driver (reference eval_utils.py:24)."""
    import jax
    from cpd_tpu.parallel import make_eval_step, make_mesh

    mesh = make_mesh()
    eval_step = make_eval_step(model, mesh)
    det_annos = []
    t0 = time.time()
    n = 0
    from tools.train import device_batch

    with mesh:
        for i, batch in enumerate(loader):
            preds = eval_step(state, device_batch(batch))
            preds = jax.device_get(preds)
            det_annos += dataset.generate_prediction_dicts(batch, preds, class_names)
            n += batch["batch_size"]
            if debug_steps and i + 1 >= debug_steps:
                break
    dt = time.time() - t0
    logger.info(f"eval: {n} frames in {dt:.1f}s ({n / max(dt, 1e-6):.2f} f/s)")
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "result.pkl", "wb") as f:
        pickle.dump(det_annos, f)
    result_str, result_dict = dataset.evaluation(det_annos, class_names)
    try:
        from cpd_tpu.evaluation.ap import recall_stats

        rec = recall_stats(det_annos, dataset.collect_gt_annos()[: len(det_annos)])
        result_dict.update(rec)
        logger.info("recall: " + " ".join(f"{k}={v:.4f}" for k, v in rec.items() if k != "gt_count"))
    except Exception:
        pass
    logger.info("\n" + result_str)
    return result_dict


def main(argv=None, dataset=None, state=None):
    args = parse_args(argv)

    import jax

    from cpd_tpu.utils.common import enable_compile_cache
    enable_compile_cache()
    from cpd_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    from cpd_tpu.datasets import build_dataloader
    from cpd_tpu.models import build_network
    from cpd_tpu.parallel import build_optimizer, init_state
    from cpd_tpu.utils.checkpoint import list_checkpoints, load_checkpoint
    from cpd_tpu.utils.common import create_logger
    from tools.train import device_batch

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    n_devices = len(jax.devices())
    batch_size = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU) * n_devices
    batch_size = max(batch_size - batch_size % n_devices, n_devices)
    out_dir = Path(args.output_dir or f"output/{cfg.TAG}/{args.extra_tag}/eval")
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(out_dir / "log_eval.txt")

    test_set, test_loader, _ = build_dataloader(
        cfg.DATA_CONFIG, cfg.CLASS_NAMES, batch_size,
        root_path=cfg.DATA_CONFIG.get("DATA_PATH"), workers=args.workers,
        training=False, dataset=dataset,
    )
    model = build_network(cfg.MODEL, len(cfg.CLASS_NAMES), cfg.DATA_CONFIG)

    if state is None:
        tx = build_optimizer(cfg.OPTIMIZATION, 1)
        first = device_batch(next(iter(test_loader)))
        state = init_state(model, first, tx)

    def restore(path):
        payload = load_checkpoint(path, state)
        return state.replace(params=payload["params"], batch_stats=payload["batch_stats"])

    if args.ckpt:
        st = restore(args.ckpt)
        return eval_one_checkpoint(model, st, test_loader, test_set, cfg.CLASS_NAMES,
                                   logger, out_dir, args.debug_steps)
    if args.eval_all and args.ckpt_dir:
        evaluated = set()
        waited = 0.0
        results = {}
        while waited < args.max_waiting_mins * 60:
            fresh = [c for c in list_checkpoints(args.ckpt_dir)
                     if c[0] >= args.start_epoch and c[0] not in evaluated]
            if not fresh:
                time.sleep(30)
                waited += 30
                continue
            waited = 0.0
            for epoch, path in fresh:
                logger.info(f"evaluating epoch {epoch}")
                st = restore(path)
                results[epoch] = eval_one_checkpoint(
                    model, st, test_loader, test_set, cfg.CLASS_NAMES, logger,
                    out_dir / f"epoch_{epoch}", args.debug_steps)
                evaluated.add(epoch)
        return results
    # no ckpt: evaluate the randomly initialized model (smoke)
    return eval_one_checkpoint(model, state, test_loader, test_set, cfg.CLASS_NAMES,
                               logger, out_dir, args.debug_steps)


if __name__ == "__main__":
    main()
