"""Model layer: functional detector stack built from flax.linen modules.

Mirrors the reference registry contract (cpd/models/__init__.py:9
``build_network`` and detectors/detector3d_template.py) with a TPU-first
design: batch dicts of fixed-capacity arrays flow through jitted pure
functions; no module ever sees a dynamic shape.
"""
from .detector import build_network, VoxelRCNN  # noqa: F401
