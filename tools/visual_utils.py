"""BEV scene visualization (matplotlib; replaces the mayavi draw_scenes of
cpd/tools/visual_utils/visualize_utils.py:142 -- headless-friendly)."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def draw_scenes(points, gt_boxes=None, ref_boxes=None, out_path="scene.png",
                point_size: float = 0.2, bound: float = 80.0):
    """Save a BEV PNG: points gray, gt boxes green, predictions red."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 12))
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], s=point_size, c=pts[:, 2], cmap="viridis",
               alpha=0.5, linewidths=0)

    def draw_boxes(boxes, color):
        from cpd_tpu.datasets.augmentor import boxes_bev_corners

        boxes = np.asarray(boxes).reshape(-1, boxes.shape[-1])
        if not len(boxes):
            return
        corners = boxes_bev_corners(boxes[:, :7])
        for c, b in zip(corners, boxes):
            poly = np.vstack([c, c[:1]])
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.0)
            # heading tick
            cx, cy, yaw = b[0], b[1], b[6]
            ax.plot([cx, cx + np.cos(yaw) * b[3] / 2], [cy, cy + np.sin(yaw) * b[3] / 2],
                    color=color, linewidth=1.0)

    if gt_boxes is not None:
        draw_boxes(gt_boxes, "lime")
    if ref_boxes is not None:
        draw_boxes(ref_boxes, "red")
    ax.set_xlim(-bound, bound)
    ax.set_ylim(-bound, bound)
    ax.set_aspect("equal")
    ax.set_facecolor("black")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path
