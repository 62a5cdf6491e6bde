#!/usr/bin/env bash
# Multi-host data-parallel launch (parity with the reference dist_train.sh,
# which used torch.distributed.launch over 4 GPUs). On TPU pods, run ONE
# process per host; jax.distributed discovers peers from the TPU runtime:
#
#   on every host:  bash tools/dist_train.sh --cfg_file tools/cfgs/models/voxel_rcnn_cproto_center.yaml
#
# Single-host multi-chip needs no launcher at all: the 1-D Mesh('data') in
# cpd_tpu.parallel spans all local devices automatically.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python tools/train.py "$@"
