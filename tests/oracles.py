"""Pure-NumPy oracle implementations used to validate the JAX ops.

Written independently from first principles (Sutherland-Hodgman clipping,
brute-force point-in-box) so the JAX implementations are checked against a
second, structurally different formulation.
"""
import numpy as np


def box_to_corners_bev(box):
    """(7,) -> (4, 2) ccw corners."""
    x, y, _, dx, dy, _, yaw = box[:7]
    local = np.array([[dx, dy], [-dx, dy], [-dx, -dy], [dx, -dy]]) / 2.0
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def polygon_clip(subject, clipper):
    """Sutherland-Hodgman: clip ccw polygon ``subject`` by convex ccw ``clipper``."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def intersect(p1, p2, a, b):
        d1 = np.array(p2) - np.array(p1)
        d2 = np.array(b) - np.array(a)
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
        return np.array(p1) + t * d1

    output = list(subject)
    for i in range(len(clipper)):
        a, b = clipper[i], clipper[(i + 1) % len(clipper)]
        input_list, output = output, []
        if not input_list:
            break
        s = input_list[-1]
        for p in input_list:
            if inside(p, a, b):
                if not inside(s, a, b):
                    output.append(intersect(s, p, a, b))
                output.append(p)
            elif inside(s, a, b):
                output.append(intersect(s, p, a, b))
            s = p
    return output


def polygon_area(poly):
    if len(poly) < 3:
        return 0.0
    poly = np.asarray(poly)
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def overlap_bev(box_a, box_b):
    ca = box_to_corners_bev(box_a)
    cb = box_to_corners_bev(box_b)
    return polygon_area(polygon_clip(ca, cb))


def iou_bev(box_a, box_b):
    o = overlap_bev(box_a, box_b)
    area_a = box_a[3] * box_a[4]
    area_b = box_b[3] * box_b[4]
    return o / max(area_a + area_b - o, 1e-6)


def iou_3d(box_a, box_b):
    o = overlap_bev(box_a, box_b)
    zo = max(
        0.0,
        min(box_a[2] + box_a[5] / 2, box_b[2] + box_b[5] / 2)
        - max(box_a[2] - box_a[5] / 2, box_b[2] - box_b[5] / 2),
    )
    inter = o * zo
    va = box_a[3] * box_a[4] * box_a[5]
    vb = box_b[3] * box_b[4] * box_b[5]
    return inter / max(va + vb - inter, 1e-6)


def points_in_box(points, box):
    """(N, 3), (7,) -> (N,) bool."""
    shifted = points[:, :3] - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    lx = shifted[:, 0] * c - shifted[:, 1] * s
    ly = shifted[:, 0] * s + shifted[:, 1] * c
    return (
        (np.abs(lx) <= box[3] / 2)
        & (np.abs(ly) <= box[4] / 2)
        & (np.abs(shifted[:, 2]) <= box[5] / 2)
    )


def greedy_nms(boxes, scores, thresh, iou_fn=iou_bev):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if iou_fn(boxes[i], boxes[j]) > thresh:
                suppressed[j] = True
    return keep


def random_boxes(n, rng, span=20.0):
    boxes = np.zeros((n, 7))
    boxes[:, 0:2] = rng.uniform(-span, span, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:5] = rng.uniform(1.0, 5.0, (n, 2))
    boxes[:, 5] = rng.uniform(1.0, 3.0, n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes
