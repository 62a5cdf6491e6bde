"""Offline detection ensembling via Weighted Box Fusion.

Parity with cpd/datasets/kitti/kitti_object_eval_python/merge_detections.py
(offline WBF over multiple result.pkl dumps, e.g. TTA passes or model
ensembles). Usage:

  python tools/merge_detections.py out.pkl a/result.pkl b/result.pkl ...
"""
from __future__ import annotations

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def merge_result_files(paths, iou_thresh: float = 0.7):
    import jax.numpy as jnp

    from cpd_tpu.ops.nms import weighted_box_fusion

    all_results = []
    for p in paths:
        with open(p, "rb") as f:
            all_results.append(pickle.load(f))
    n = min(len(r) for r in all_results)
    merged = []
    for i in range(n):
        frames = [r[i] for r in all_results]
        boxes = np.concatenate([np.asarray(f["boxes_lidar"]).reshape(-1, 7) for f in frames])
        scores = np.concatenate([np.asarray(f["score"]).reshape(-1) for f in frames])
        names = np.concatenate([np.asarray(f["name"]).reshape(-1) for f in frames])
        if len(boxes) == 0:
            merged.append(frames[0])
            continue
        uniq = {n_: k for k, n_ in enumerate(sorted(set(names.tolist())))}
        labels = np.asarray([uniq[x] for x in names], np.int32)
        fused, fscores, flabels, mask = weighted_box_fusion(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), iou_thresh
        )
        m = np.asarray(mask)
        inv = {v: k for k, v in uniq.items()}
        merged.append({
            "frame_id": frames[0]["frame_id"],
            "boxes_lidar": np.asarray(fused)[m],
            "score": np.asarray(fscores)[m],
            "name": np.asarray([inv[int(l)] for l in np.asarray(flabels)[m]]),
        })
    return merged




def merge_detections_tracking(result_pkl, out_pkl, match_dist: float = 3.0,
                              min_track_len: int = 2):
    """Sequence-level detection smoothing via the Kalman tracker
    (merge_detections_tracking.py capability): track per-frame detections,
    re-emit smoothed track boxes with track-max scores."""
    from cpd_tpu.unsupervised.tracker import TrackSmooth

    with open(result_pkl, "rb") as f:
        dets = pickle.load(f)
    boxes = [np.asarray(d["boxes_lidar"]).reshape(-1, 7) for d in dets]
    scores = [np.asarray(d["score"]).reshape(-1) for d in dets]
    sm = TrackSmooth({"match_dist": match_dist}, min_track_len)
    sm.tracking(boxes, scores)
    out = []
    for f_i, d in enumerate(dets):
        b, names, ids, s = sm.get_current_frame_objects_and_cls(f_i)
        out.append({**d, "boxes_lidar": b.astype(np.float32), "score": np.asarray(s, np.float32),
                    "name": names, "track_ids": ids})
    with open(out_pkl, "wb") as f:
        pickle.dump(out, f)
    return out


def average_checkpoints(ckpt_paths, out_path):
    """Model-soup checkpoint averaging (merge_model.py capability)."""
    import jax

    from cpd_tpu.utils.checkpoint import load_checkpoint

    payloads = [load_checkpoint(p) for p in ckpt_paths]
    avg = jax.tree_util.tree_map(lambda *xs: np.mean(np.stack(xs), axis=0),
                                 *[p["params"] for p in payloads])
    payloads[0]["params"] = avg
    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(Path(out_path).absolute(), payloads[0])
    return out_path


if __name__ == "__main__":
    out, *ins = sys.argv[1:]
    merged = merge_result_files(ins)
    with open(out, "wb") as f:
        pickle.dump(merged, f)
    print(f"merged {len(ins)} result files -> {out} ({len(merged)} frames)")
