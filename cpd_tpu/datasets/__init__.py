"""Data layer: fixed-capacity sample protocol, augmentors, dataset readers.

Parity with the reference data layer (cpd/datasets/: DatasetTemplate,
DataAugmentor, DataProcessor, build_dataloader) re-designed for TPU feeding:
every sample is padded/truncated to static capacities on the host; the
voxelization the reference does on CPU workers (spconv Point2VoxelCPU3d)
happens ON DEVICE inside the jitted step (cpd_tpu.ops.voxelizer), so the host
pipeline only selects, augments and pads points.
"""
from .dataset import DatasetTemplate, collate_batch  # noqa: F401
from .loader import build_dataloader  # noqa: F401
