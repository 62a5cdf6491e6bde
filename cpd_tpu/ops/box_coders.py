"""Box encode/decode coders (pure functions, vmappable).

Parity with cpd/utils/box_coder_utils.py: ResidualCoder (:5),
ResidualCoderV2 (:81), PointResidualCoder (:282). Encoding convention:
targets = (dx/diag, dy/diag, dz/dza, log ratios, heading residual [+ sin/cos]).
"""
from __future__ import annotations

import jax.numpy as jnp


class ResidualCoder:
    """Anchor-residual coder, code_size 7 (+2 if encode_angle_by_sincos)."""

    def __init__(self, code_size: int = 7, encode_angle_by_sincos: bool = False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """boxes/anchors: (..., 7 + C) -> (..., code_size)."""
        dxa = jnp.clip(anchors[..., 3], min=1e-5)
        dya = jnp.clip(anchors[..., 4], min=1e-5)
        dza = jnp.clip(anchors[..., 5], min=1e-5)
        dxg = jnp.clip(boxes[..., 3], min=1e-5)
        dyg = jnp.clip(boxes[..., 4], min=1e-5)
        dzg = jnp.clip(boxes[..., 5], min=1e-5)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (boxes[..., 0] - anchors[..., 0]) / diag
        yt = (boxes[..., 1] - anchors[..., 1]) / diag
        zt = (boxes[..., 2] - anchors[..., 2]) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            # component residuals in reference order [cos, sin]
            # (box_coder_utils.py:37-40), NOT a rotation delta
            rt = [jnp.cos(boxes[..., 6]) - jnp.cos(anchors[..., 6]),
                  jnp.sin(boxes[..., 6]) - jnp.sin(anchors[..., 6])]
        else:
            rt = [boxes[..., 6] - anchors[..., 6]]
        rest = [boxes[..., 7 + i] - anchors[..., 7 + i] for i in range(boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rt, *rest], axis=-1)

    def decode(self, encodings, anchors):
        """encodings: (..., code_size), anchors: (..., 7 + C) -> (..., 7 + C)."""
        dxa = jnp.clip(anchors[..., 3], min=1e-5)
        dya = jnp.clip(anchors[..., 4], min=1e-5)
        dza = jnp.clip(anchors[..., 5], min=1e-5)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = encodings[..., 0] * diag + anchors[..., 0]
        yg = encodings[..., 1] * diag + anchors[..., 1]
        zg = encodings[..., 2] * dza + anchors[..., 2]
        # clamp the log-dim residuals before exp: masked/garbage rows (e.g.
        # invalid rois under the static-shape loss masking) can carry huge
        # residuals whose exp overflows to inf and NaN-contaminates any
        # downstream masked sum. exp(20) ~ 4.9e8: no real residual is cut
        # (torch.exp in the reference is equally unbounded but its dynamic
        # boolean indexing never evaluates masked rows).
        dxg = jnp.exp(jnp.clip(encodings[..., 3], -20.0, 20.0)) * dxa
        dyg = jnp.exp(jnp.clip(encodings[..., 4], -20.0, 20.0)) * dya
        dzg = jnp.exp(jnp.clip(encodings[..., 5], -20.0, 20.0)) * dza
        if self.encode_angle_by_sincos:
            # inverse of the component residuals (box_coder_utils.py:71-74)
            rg_cos = encodings[..., 6] + jnp.cos(anchors[..., 6])
            rg_sin = encodings[..., 7] + jnp.sin(anchors[..., 6])
            rg = jnp.arctan2(rg_sin, rg_cos)
            rest_start = 8
        else:
            rg = encodings[..., 6] + anchors[..., 6]
            rest_start = 7
        rest = [
            encodings[..., rest_start + i] + anchors[..., 7 + i]
            for i in range(anchors.shape[-1] - 7)
        ]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *rest], axis=-1)


class ResidualCoderV2(ResidualCoder):
    """V2 (box_coder_utils.py:81): UNNORMALIZED residuals -- plain center
    deltas (no diagonal scaling), ABSOLUTE log-dims (no anchor ratio),
    absolute sincos (or residual heading), and z referenced at the box
    BOTTOM face of both box and anchor."""

    def encode(self, boxes, anchors):
        dxg = jnp.clip(boxes[..., 3], min=1e-5)
        dyg = jnp.clip(boxes[..., 4], min=1e-5)
        dzg = jnp.clip(boxes[..., 5], min=1e-5)
        dza = jnp.clip(anchors[..., 5], min=1e-5)
        za = anchors[..., 2] - dza / 2
        zg = boxes[..., 2] - dzg / 2
        xt = boxes[..., 0] - anchors[..., 0]
        yt = boxes[..., 1] - anchors[..., 1]
        zt = zg - za
        dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        if self.encode_angle_by_sincos:
            rt = [jnp.cos(boxes[..., 6]), jnp.sin(boxes[..., 6])]
        else:
            rt = [boxes[..., 6] - anchors[..., 6]]
        rest = [boxes[..., 7 + i] - anchors[..., 7 + i]
                for i in range(boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rt, *rest], axis=-1)

    def decode(self, encodings, anchors):
        dza = jnp.clip(anchors[..., 5], min=1e-5)
        za = anchors[..., 2] - dza / 2
        xg = encodings[..., 0] + anchors[..., 0]
        yg = encodings[..., 1] + anchors[..., 1]
        dxg = jnp.exp(encodings[..., 3])
        dyg = jnp.exp(encodings[..., 4])
        dzg = jnp.exp(encodings[..., 5])
        zg = encodings[..., 2] + za + dzg / 2
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(encodings[..., 7], encodings[..., 6])
            rest_start = 8
        else:
            rg = encodings[..., 6] + anchors[..., 6]
            rest_start = 7
        rest = [encodings[..., rest_start + i] + anchors[..., 7 + i]
                for i in range(anchors.shape[-1] - 7)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *rest], axis=-1)


class PointResidualCoder:
    """Point-based coder with class-mean sizes (box_coder_utils.py:282)."""

    def __init__(self, code_size: int = 8, use_mean_size: bool = True, mean_size=None, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = jnp.asarray(mean_size, dtype=jnp.float32)

    def encode(self, gt_boxes, points, gt_classes=None):
        xg, yg, zg = gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2]
        dxg = jnp.clip(gt_boxes[..., 3], min=1e-5)
        dyg = jnp.clip(gt_boxes[..., 4], min=1e-5)
        dzg = jnp.clip(gt_boxes[..., 5], min=1e-5)
        rg = gt_boxes[..., 6]
        if self.use_mean_size:
            pt_size = self.mean_size[gt_classes - 1]
            dxa, dya, dza = pt_size[..., 0], pt_size[..., 1], pt_size[..., 2]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - points[..., 0]) / diag
            yt = (yg - points[..., 1]) / diag
            zt = (zg - points[..., 2]) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt = xg - points[..., 0]
            yt = yg - points[..., 1]
            zt = zg - points[..., 2]
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg)], axis=-1)

    def decode(self, encodings, points, pred_classes=None):
        xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
        dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]
        cost, sint = encodings[..., 6], encodings[..., 7]
        if self.use_mean_size:
            pt_size = self.mean_size[pred_classes - 1]
            dxa, dya, dza = pt_size[..., 0], pt_size[..., 1], pt_size[..., 2]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diag + points[..., 0]
            yg = yt * diag + points[..., 1]
            zg = zt * dza + points[..., 2]
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg = xt + points[..., 0]
            yg = yt + points[..., 1]
            zg = zt + points[..., 2]
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


class PreviousResidualDecoder:
    """Decode residuals relative to previous-frame boxes
    (box_coder_utils.py:218): predictions are offsets from the prior box."""

    def __init__(self, code_size: int = 7, **kwargs):
        self.code_size = code_size

    @staticmethod
    def decode(encodings, prev_boxes):
        diag = jnp.sqrt(jnp.clip(prev_boxes[..., 3], min=1e-5) ** 2
                        + jnp.clip(prev_boxes[..., 4], min=1e-5) ** 2)
        xg = encodings[..., 0] * diag + prev_boxes[..., 0]
        yg = encodings[..., 1] * diag + prev_boxes[..., 1]
        zg = encodings[..., 2] * jnp.clip(prev_boxes[..., 5], min=1e-5) + prev_boxes[..., 2]
        dxg = jnp.exp(encodings[..., 3]) * prev_boxes[..., 3]
        dyg = jnp.exp(encodings[..., 4]) * prev_boxes[..., 4]
        dzg = jnp.exp(encodings[..., 5]) * prev_boxes[..., 5]
        rg = encodings[..., 6] + prev_boxes[..., 6]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


class PreviousResidualRoIDecoder(PreviousResidualDecoder):
    """RoI variant (box_coder_utils.py:250): identical math applied to rois."""
