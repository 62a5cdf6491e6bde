"""Raw Waymo TFRecord ingestion -> processed npy/pkl layout.

Parity with cpd/datasets/waymo_unsupervised/waymo_utils.py:34-333
(process_single_sequence): decode BOTH lidar returns per frame with
per-point NLZ flags, save ``NNNN.npy`` as float16 (N, 6)
[x y z intensity elongation NLZ] (first-return block then second-return
block, save_lidar_points :196-203), and write ``<seq>.pkl`` infos carrying
pose, labels, per-lidar point counts for both returns, camera calibration
metadata, context name, timestamp and the ``no_label_zone_list`` polygons
(:316-325).

The TF decode itself requires the ``waymo_open_dataset`` package, which is
not in this image -- those entry points degrade with an actionable error.
Everything that is NOT the TF decode (layout assembly, pose/intrinsic math,
the no-label-zone structure, and the NLZ-filter semantics the dataset
consumer applies, waymo_unsupervised_dataset.py:137-142) is pure NumPy and
unit-tested offline (tests/test_waymo_ingest.py).
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

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


# --------------------------------------------------------------------------
# pure-NumPy layout/structure helpers (TF-free, unit-tested)
# --------------------------------------------------------------------------

def assemble_return_points(per_laser: Sequence[Dict[str, np.ndarray]],
                           ) -> Tuple[np.ndarray, List[int]]:
    """One lidar return's per-laser decodes -> the reference read_lidar
    layout (waymo_utils.py:176-194): float32 (N, 6)
    [x y z intensity elongation NLZ] concatenated over the 5 lasers in
    calibration-name order, plus the per-laser point counts."""
    cols = []
    counts = []
    for d in per_laser:
        xyz = np.asarray(d["xyz"], np.float32).reshape(-1, 3)
        n = len(xyz)
        counts.append(n)
        cols.append(np.concatenate([
            xyz,
            np.asarray(d["intensity"], np.float32).reshape(n, 1),
            np.asarray(d["elongation"], np.float32).reshape(n, 1),
            np.asarray(d["nlz"], np.float32).reshape(n, 1),
        ], axis=1))
    pts = (np.concatenate(cols, axis=0) if cols
           else np.zeros((0, 6), np.float32))
    return pts, counts


def assemble_save_points(first_return: np.ndarray,
                         second_return: np.ndarray) -> np.ndarray:
    """Both returns -> the on-disk layout: first-return rows then
    second-return rows, cast to float16 (save_lidar_points, :196-203)."""
    return np.concatenate([first_return, second_return], axis=0).astype(np.float16)


def nlz_filter_points(point_features: np.ndarray) -> np.ndarray:
    """The consumer-side semantics of the saved layout
    (waymo_unsupervised_dataset.py get_lidar :137-144): keep only rows whose
    NLZ flag (column 5) == -1 (points inside a no-label zone carry the zone
    index >= 0), then tanh-squash intensity. Returns (M, 5) float32."""
    pf = np.asarray(point_features, np.float32)
    points_all, nlz_flag = pf[:, 0:5], pf[:, 5]
    points_all = points_all[nlz_flag == -1]
    points_all[:, 3] = np.tanh(points_all[:, 3])
    return points_all


def build_no_label_zone_list(zones) -> List[Dict]:
    """frame.no_label_zones -> the reference info structure (:316-325):
    a list of single-entry dicts {zone_id: [x_list, y_list]}."""
    out = []
    for z in zones:
        out.append({z.id: [list(z.x), list(z.y)]})
    return out


def pose_from_transform(transform) -> np.ndarray:
    """16-vector row-major proto transform -> (4, 4) float32 (:305)."""
    return np.array(transform, dtype=np.float32).reshape(4, 4)


def camera_intrinsic_matrix(intrinsic_waymo: np.ndarray) -> np.ndarray:
    """Waymo 9-vector [f_u f_v c_u c_v k...] -> 3x4 pinhole matrix
    (:257-263)."""
    iw = np.asarray(intrinsic_waymo, np.float32)
    intrinsic = np.zeros((3, 4))
    intrinsic[0, 0] = iw[0]
    intrinsic[1, 1] = iw[1]
    intrinsic[0, 2] = iw[2]
    intrinsic[1, 2] = iw[3]
    intrinsic[2, 2] = 1
    return intrinsic


def generate_labels_from(laser_labels) -> Dict[str, np.ndarray]:
    """Label protos -> annos dict (reference generate_labels :34-77
    semantics: unknown difficulty with <= 5 points backfills level 2)."""
    boxes, names, npts, difficulty, ids = [], [], [], [], []
    for label in laser_labels:
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


def build_frame_info(sequence_name: str, sample_idx: int, pose: np.ndarray,
                     annos, counts_0: List[int], counts_1: List[int],
                     context_name: str, timestamp_micros: int,
                     no_label_zone_list: List[Dict],
                     image_info: Dict = None) -> Dict:
    """The reference per-frame info schema (:233-326)."""
    info = {
        "point_cloud": {"num_features": 5, "lidar_sequence": sequence_name,
                        "sample_idx": sample_idx},
        "frame_id": sequence_name + ("_%03d" % sample_idx),
        "pose": pose,
        "num_points_of_each_lidar_0": counts_0,
        "num_points_of_each_lidar_1": counts_1,
        "context_name": context_name,
        "timestamp_micros": timestamp_micros,
        "no_label_zone_list": no_label_zone_list,
    }
    if annos is not None:
        info["annos"] = annos
    if image_info is not None:
        info["image"] = image_info
    return info


# --------------------------------------------------------------------------
# TF decode (gated on waymo_open_dataset)
# --------------------------------------------------------------------------

def decode_return(frame, range_images, camera_projections,
                  range_image_top_pose, ri_index: int):  # pragma: no cover
    """Decode one lidar return of every laser with PER-POINT NLZ flags
    (reference convert_range_image_to_point_cloud :80-176: channel 0 range,
    1 intensity, 2 elongation, 3 NLZ)."""
    _require_waymo()
    import tensorflow as tf

    calibrations = sorted(frame.context.laser_calibrations, key=lambda c: c.name)
    frame_pose = tf.convert_to_tensor(
        np.reshape(np.array(frame.pose.transform), [4, 4]))
    top_pose = tf.reshape(
        tf.convert_to_tensor(range_image_top_pose.data),
        range_image_top_pose.shape.dims)
    rot = transform_utils.get_rotation_matrix(
        top_pose[..., 0], top_pose[..., 1], top_pose[..., 2])
    top_pose = transform_utils.get_transform(rot, top_pose[..., 3:])
    per_laser = []
    for c in calibrations:
        range_image = range_images[c.name][ri_index]
        if len(c.beam_inclinations) == 0:
            beam_inclinations = range_image_utils.compute_inclination(
                tf.constant([c.beam_inclination_min, c.beam_inclination_max]),
                height=range_image.shape.dims[0])
        else:
            beam_inclinations = tf.constant(c.beam_inclinations)
        beam_inclinations = tf.reverse(beam_inclinations, axis=[-1])
        extrinsic = np.reshape(np.array(c.extrinsic.transform), [4, 4])
        ri = tf.reshape(tf.convert_to_tensor(range_image.data),
                        range_image.shape.dims)
        pixel_pose_local = None
        frame_pose_local = None
        if c.name == dataset_pb2.LaserName.TOP:
            pixel_pose_local = tf.expand_dims(top_pose, axis=0)
            frame_pose_local = tf.expand_dims(frame_pose, axis=0)
        mask = ri[..., 0] > 0
        cartesian = range_image_utils.extract_point_cloud_from_range_image(
            tf.expand_dims(ri[..., 0], axis=0),
            tf.expand_dims(extrinsic, axis=0),
            tf.expand_dims(tf.convert_to_tensor(beam_inclinations), axis=0),
            pixel_pose=pixel_pose_local,
            frame_pose=frame_pose_local)
        cartesian = tf.squeeze(cartesian, axis=0)
        where = tf.where(mask)
        per_laser.append({
            "xyz": tf.gather_nd(cartesian, where).numpy(),
            "intensity": tf.gather_nd(ri[..., 1], where).numpy(),
            "elongation": tf.gather_nd(ri[..., 2], where).numpy(),
            "nlz": tf.gather_nd(ri[..., 3], where).numpy(),
        })
    return per_laser


def read_lidar(frame, ri_index: int = 0):  # pragma: no cover
    """One return -> (float32 (N, 6) points, per-laser counts)."""
    _require_waymo()
    range_images, camera_projections, _, range_image_top_pose = (
        frame_utils.parse_range_image_and_camera_projection(frame))
    per_laser = decode_return(frame, range_images, camera_projections,
                              range_image_top_pose, ri_index)
    return assemble_return_points(per_laser)


def save_lidar_points(frame, cur_save_path):  # pragma: no cover
    """BOTH returns -> fp16 npy (save_lidar_points :196-203)."""
    first_return, num_0 = read_lidar(frame, ri_index=0)
    second_return, num_1 = read_lidar(frame, ri_index=1)
    np.save(cur_save_path, assemble_save_points(first_return, second_return))
    return num_0, num_1


def _image_info(frame, save_dir=None):  # pragma: no cover
    """Camera calibration/metadata block (:239-299). JPG decoding is
    skipped unless cv2 is importable (the detector never reads the jpgs)."""
    image_info = {"image_shape": {}, "intrinsic_waymo": {}, "intrinsic": {},
                  "extrinsic": {}, "rolling_shutter_direction": {},
                  "camera_image_metadata": {}}
    for calib in frame.context.camera_calibrations:
        cam = calib.name
        image_info["image_shape"][cam] = (calib.height, calib.width)
        iw = np.array(calib.intrinsic, dtype=np.float32)
        image_info["intrinsic_waymo"][cam] = iw
        image_info["intrinsic"][cam] = camera_intrinsic_matrix(iw)
        image_info["extrinsic"][cam] = np.array(
            calib.extrinsic.transform, dtype=np.float32).reshape(4, 4)
        image_info["rolling_shutter_direction"][cam] = (
            calib.rolling_shutter_direction)
    for image in frame.images:
        meta = list(image.pose.transform)
        meta += [image.velocity.v_x, image.velocity.v_y, image.velocity.v_z,
                 image.velocity.w_x, image.velocity.w_y, image.velocity.w_z,
                 image.pose_timestamp, image.shutter,
                 image.camera_trigger_time, image.camera_readout_done_time]
        image_info["camera_image_metadata"][image.name] = meta
        if save_dir is not None:
            try:
                import cv2
                import tensorflow as tf

                jpg = np.array(tf.image.decode_jpeg(image.image))
                cv2.imwrite(str(Path(save_dir) / f"{image.name}.jpg"),
                            jpg[:, :, ::-1])
            except ImportError:
                pass
    return image_info


def generate_labels(frame):  # pragma: no cover - needs waymo_open_dataset
    """Frame proto -> annos dict."""
    _require_waymo()
    return generate_labels_from(frame.laser_labels)


def process_single_sequence(tfrecord_path, out_root, sampled_interval: int = 1,
                            has_label: bool = True,
                            save_images: bool = False):  # pragma: no cover
    """TFRecord -> <out_root>/<seq>/{NNNN.npy, <seq>.pkl} (reference layout,
    process_single_sequence :206-333)."""
    _require_waymo()
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
        im_dir = seq_dir / "image" / str(i).zfill(4)
        if save_images:
            im_dir.mkdir(parents=True, exist_ok=True)
        image_info = _image_info(frame, im_dir if save_images else None)
        counts_0, counts_1 = save_lidar_points(frame, seq_dir / f"{i:04d}.npy")
        infos.append(build_frame_info(
            seq_name, i, pose_from_transform(frame.pose.transform),
            generate_labels(frame) if has_label else None,
            counts_0, counts_1, frame.context.name, frame.timestamp_micros,
            build_no_label_zone_list(frame.no_label_zones), image_info))
    with open(pkl_path, "wb") as f:
        pickle.dump(infos, f)
    return infos
