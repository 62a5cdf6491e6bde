"""CPD-TPU: a TPU-native (JAX/XLA/Pallas/pjit) unsupervised LiDAR 3D detection framework.

Re-designed from scratch with the capabilities of hailanyi/CPD (CVPR 2024):
an offline pseudo-label factory (PPScore, ground removal, clustering, box
fitting, Kalman tracking, CProto refinement) feeding a VoxelRCNN-style
two-stage detector with prototype distillation, trained data-parallel with
pjit over a device mesh.

Layer map (mirrors SURVEY.md section 1 of the reference, rebuilt TPU-first):
  cpd_tpu.ops           -- geometry / IoU / NMS / voxelizer / sparse-conv substrate
  cpd_tpu.kernels       -- Pallas TPU kernels for the hot ops
  cpd_tpu.models        -- functional detector stack (VFE, sparse backbone, BEV, heads)
  cpd_tpu.datasets      -- data layer: fixed-capacity sample protocol, augmentors, readers
  cpd_tpu.parallel      -- mesh construction, sharded train/eval steps, collectives
  cpd_tpu.unsupervised  -- pseudo-label factory
  cpd_tpu.utils         -- losses, box coders, config, logging
"""

__version__ = "0.1.0"
