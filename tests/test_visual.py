"""Smoke tests for the scene visualizers (tools/visual_utils.py)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([
        rng.uniform(-50, 50, (5000, 2)),
        rng.uniform(-2, 4, (5000, 1)),
    ], axis=1).astype(np.float32)
    gt = np.array([[5, 5, 0.5, 4, 2, 1.6, 0.4],
                   [0, -10, 0.3, 4.5, 2, 1.5, 1.2]], np.float32)
    pred = np.array([[5.2, 5.1, 0.5, 4, 2, 1.6, 0.45]], np.float32)
    return pts, gt, pred


def test_draw_scenes_bev(tmp_path):
    from tools.visual_utils import draw_scenes

    pts, gt, pred = _scene()
    out = draw_scenes(pts, gt, pred, out_path=str(tmp_path / "bev.png"))
    assert Path(out).stat().st_size > 10_000


def test_draw_scenes_3d(tmp_path):
    """The mayavi draw_scenes equivalent (visualize_utils.py:142):
    3-D wireframes + score/label tags, headless PNG."""
    from tools.visual_utils import draw_scenes_3d

    pts, gt, pred = _scene()
    out = draw_scenes_3d(pts, gt, pred, ref_scores=[0.91],
                         ref_labels=["Vehicle"],
                         out_path=str(tmp_path / "s3d.png"))
    assert Path(out).stat().st_size > 10_000
