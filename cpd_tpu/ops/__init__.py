"""TPU-native op substrate: geometry, rotated IoU/NMS, voxelization, sparse conv.

Each module here is the TPU-first equivalent of one native (CUDA/C++) component
of the reference (SURVEY.md section 2.1): static shapes, masked validity,
vmap/lax formulations that XLA can tile onto the MXU/VPU, with Pallas kernels
in ``cpd_tpu.kernels`` for the hot paths.
"""
from . import geometry, iou3d, nms, box_coders, roipool  # noqa: F401
