import numpy as np
import jax.numpy as jnp

from cpd_tpu.ops import geometry
from . import oracles


def test_limit_period():
    vals = np.array([0.0, np.pi, -np.pi, 3.3 * np.pi, -2.7], dtype=np.float32)
    out = np.asarray(geometry.limit_period(jnp.asarray(vals), 0.5, np.pi))
    expected = vals - np.floor(vals.astype(np.float32) / np.float32(np.pi) + 0.5) * np.float32(np.pi)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_rotate_points_along_z():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 10, 5)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, size=(2,)).astype(np.float32)
    out = np.asarray(geometry.rotate_points_along_z(jnp.asarray(pts), jnp.asarray(ang)))
    for b in range(2):
        c, s = np.cos(ang[b]), np.sin(ang[b])
        rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], dtype=np.float32)
        expected = pts[b, :, :3] @ rot
        np.testing.assert_allclose(out[b, :, :3], expected, atol=1e-5)
        np.testing.assert_allclose(out[b, :, 3:], pts[b, :, 3:], atol=0)


def test_corners_consistent_with_bev():
    rng = np.random.default_rng(1)
    boxes = oracles.random_boxes(20, rng).astype(np.float32)
    corners3d = np.asarray(geometry.boxes_to_corners_3d(jnp.asarray(boxes)))
    corners_bev = np.asarray(geometry.boxes_to_corners_bev(jnp.asarray(boxes)))
    # BEV footprint of 3d corners must match the bev corner set
    for i in range(len(boxes)):
        oracle = oracles.box_to_corners_bev(boxes[i])
        got = sorted(map(tuple, np.round(corners_bev[i], 4)))
        want = sorted(map(tuple, np.round(oracle, 4)))
        np.testing.assert_allclose(got, want, atol=1e-3)
        # bottom face xy must be a subset of the same 4 xy positions
        bot = sorted(map(tuple, np.round(corners3d[i, :4, :2], 4)))
        np.testing.assert_allclose(bot, want, atol=1e-3)


def test_points_in_boxes_mask():
    rng = np.random.default_rng(2)
    boxes = oracles.random_boxes(8, rng).astype(np.float32)
    pts = rng.uniform(-25, 25, size=(500, 3)).astype(np.float32)
    got = np.asarray(geometry.points_in_boxes_mask(jnp.asarray(pts), jnp.asarray(boxes)))
    for i in range(len(boxes)):
        want = oracles.points_in_box(pts, boxes[i])
        # boundary ties can differ by float assoc; require > 99.5% agreement
        assert (got[i] == want).mean() > 0.995


def test_points_in_boxes_index():
    rng = np.random.default_rng(3)
    boxes = oracles.random_boxes(4, rng).astype(np.float32)
    boxes[:, 0] = np.array([0.0, 30.0, -30.0, 60.0])  # disjoint
    boxes[:, 1] = 0.0
    pts = np.stack([boxes[:, 0], boxes[:, 1], boxes[:, 2]], axis=1).astype(np.float32)
    idx = np.asarray(geometry.points_in_boxes_index(jnp.asarray(pts), jnp.asarray(boxes)))
    np.testing.assert_array_equal(idx, [0, 1, 2, 3])
    far = np.array([[500.0, 500.0, 0.0]], dtype=np.float32)
    idx2 = np.asarray(geometry.points_in_boxes_index(jnp.asarray(far), jnp.asarray(boxes)))
    assert idx2[0] == -1


def test_voxel_centers():
    coords = jnp.asarray([[0, 0, 0], [1, 2, 3]], dtype=jnp.int32)  # zyx
    centers = np.asarray(
        geometry.get_voxel_centers(coords, 2, [0.1, 0.1, 0.15], [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0])
    )
    np.testing.assert_allclose(centers[0], [-75.2 + 0.1, -75.2 + 0.1, -2.0 + 0.15], atol=1e-5)
    np.testing.assert_allclose(centers[1], [-75.2 + 0.2 * 3.5, -75.2 + 0.2 * 2.5, -2.0 + 0.3 * 1.5], atol=1e-5)


def test_mask_boxes_outside_range():
    boxes = jnp.asarray(
        [[0, 0, 0, 2, 2, 2, 0.3], [200, 200, 0, 2, 2, 2, 0.0]], dtype=jnp.float32
    )
    keep = np.asarray(geometry.mask_boxes_outside_range(boxes, [-75, -75, -2, 75, 75, 4]))
    np.testing.assert_array_equal(keep, [True, False])
