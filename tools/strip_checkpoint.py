"""Checkpoint surgery: strip a training checkpoint to its model weights.

Parity: kitti_object_eval_python/save_model_paras.py (the reference's
deploy-artifact tool keeps only ``model_state`` from a training .pth).
Here: keep only params (+ batch_stats, which inference needs) and drop the
optimizer state -- typically ~2/3 of the checkpoint bytes under Adam.

Usage:
  python tools/strip_checkpoint.py <ckpt_dir> [--out <dir>]
"""
import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def strip_checkpoint(ckpt_dir, out_dir=None):
    from cpd_tpu.utils.checkpoint import _HAVE_ORBAX, load_checkpoint

    ckpt_dir = Path(ckpt_dir)
    out_dir = Path(out_dir) if out_dir else ckpt_dir.with_name(
        ckpt_dir.name + "_deploy")
    payload = load_checkpoint(ckpt_dir)
    stripped = {
        "params": payload["params"],
        "batch_stats": payload.get("batch_stats", {}),
        "step": payload.get("step", 0),
        "epoch": payload.get("epoch", 0),
        "version": payload.get("version", "cpd_tpu-0.1"),
    }
    if _HAVE_ORBAX:
        import orbax.checkpoint as ocp

        if out_dir.exists():
            shutil.rmtree(out_dir)
        ocp.PyTreeCheckpointer().save(out_dir.absolute(), stripped)
    else:  # pragma: no cover
        import pickle

        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / "state.pkl", "wb") as f:
            pickle.dump(stripped, f)
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    out = strip_checkpoint(args.ckpt_dir, args.out)
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
