"""Checkpoint save/load with rotation + auto-resume (orbax backend).

Parity with the reference ckpt semantics (tools/train_utils/train_utils.py:
100-149: {epoch, it, model_state, optimizer_state, version} saved per epoch
with rotation >= max_ckpt_save_num; auto-resume from the newest checkpoint,
tools/train.py:129-139), plus a torch .pth import shim for published weights
(detector3d_template.py:388-419 weight-layout adaptation).
"""
from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _ckpt_dir(root: Path, epoch: int) -> Path:
    return Path(root) / f"checkpoint_epoch_{epoch}"


def save_checkpoint(root, state, epoch: int, max_keep: int = 30):
    """Save {params, batch_stats, opt_state, step, epoch}; rotate old ones."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "version": "cpd_tpu-0.1",
    }
    path = _ckpt_dir(root, epoch)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if path.exists():
            shutil.rmtree(path)
        ckptr.save(path.absolute(), payload)
    else:  # pragma: no cover
        import pickle

        path.mkdir(exist_ok=True)
        with open(path / "state.pkl", "wb") as f:
            pickle.dump(payload, f)
    # rotation (train_utils.py:100-112)
    ckpts = list_checkpoints(root)
    while len(ckpts) > max_keep:
        shutil.rmtree(ckpts.pop(0)[1])
    return path


def list_checkpoints(root):
    """Sorted [(epoch, path)] of saved checkpoints."""
    root = Path(root)
    out = []
    if not root.exists():
        return out
    for p in root.iterdir():
        m = re.match(r"checkpoint_epoch_(\d+)$", p.name)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def load_checkpoint(path, target_state=None):
    """Load a checkpoint dir; with ``target_state`` restores with matching
    tree structure (needed for optimizer state dtypes/layout)."""
    path = Path(path)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        if target_state is not None:
            template = {
                "params": jax.device_get(target_state.params),
                "batch_stats": jax.device_get(target_state.batch_stats),
                "opt_state": jax.device_get(target_state.opt_state),
                "step": 0,
                "epoch": 0,
                "version": "cpd_tpu-0.1",
            }
            return ckptr.restore(path.absolute(), item=template)
        return ckptr.restore(path.absolute())
    else:  # pragma: no cover
        import pickle

        with open(path / "state.pkl", "rb") as f:
            return pickle.load(f)


def auto_resume(root, state):
    """Resume from the newest checkpoint if present (train.py:129-139).

    Returns (state, start_epoch)."""
    ckpts = list_checkpoints(root)
    if not ckpts:
        return state, 0
    epoch, path = ckpts[-1]
    payload = load_checkpoint(path, state)
    state = state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        step=np.asarray(payload["step"], np.int32),
    )
    return state, int(payload["epoch"]) + 1


def load_params_from_file(state, path, logger=None):
    """Load weights only (--pretrained_model semantics: non-strict)."""
    payload = load_checkpoint(path, state)
    if logger:
        logger.info(f"loaded pretrained params from {path}")
    return state.replace(params=payload["params"], batch_stats=payload["batch_stats"])


def load_torch_checkpoint(pth_path) -> dict:
    """Read a reference .pth into a flat {name: np.ndarray} dict.

    The key-mapping into our module tree (spconv weight layout -> our (K, Cin,
    Cout) kernels, BN running stats) is detector-specific and lives with each
    model's ``torch_key_map``; this helper only handles safe deserialization.
    """
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=False)
    if "model_state" in sd:
        sd = sd["model_state"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}
