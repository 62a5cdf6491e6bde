"""Harness smoke tests: train -> checkpoint -> resume -> eval through the CLIs."""
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from .test_datasets import SyntheticDataset


def _tiny_cfgs(tmp_path):
    data_cfg = {
        "DATASET": "SyntheticDataset",
        "POINT_CLOUD_RANGE": [-8.0, -8.0, -2.0, 8.0, 8.0, 4.0],
        "POINT_CAP": 2048,
        "GT_CAP": 16,
        "STAGES": 2,
        "POINT_FEATURE_ENCODING": {
            "used_feature_list": ["x", "y", "z", "intensity", "time"],
            "src_feature_list": ["x", "y", "z", "intensity", "time"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "transform_points_to_voxels",
             "VOXEL_SIZE": [0.25, 0.25, 0.15],
             "MAX_NUMBER_OF_VOXELS": {"train": 2048, "test": 2048}},
        ],
        "DATA_AUGMENTOR": {"AUG_CONFIG_LIST": [
            {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
        ]},
    }
    model_cfg = {
        "CLASS_NAMES": ["Vehicle", "Pedestrian", "Cyclist"],
        "DATA_CONFIG": data_cfg,
        "MODEL": {
            "NAME": "VoxelRCNN",
            "BACKBONE_3D": {"NAME": "VoxelResBackBone8x", "MM": True,
                            "VOXEL_CAPS": [1024, 512, 256, 256]},
            "DENSE_HEAD": {"POST_PROCESSING": {"NMS_CONFIG": {
                "NMS_THRESH": 0.8, "NMS_PRE_MAXSIZE": 512, "NMS_POST_MAXSIZE": 64}}},
            "ROI_HEAD": {"NAME": "VoxelRCNNProtoHead",
                         "TARGET_CONFIG": {"ROI_PER_IMAGE": 16},
                         "ROI_GRID_POOL": {"GRID_SIZE": 4}},
            "POST_PROCESSING": {"NMS_CONFIG": {
                "NMS_THRESH": 0.3, "NMS_PRE_MAXSIZE": 512, "NMS_POST_MAXSIZE": 64}},
        },
        "OPTIMIZATION": {
            "BATCH_SIZE_PER_GPU": 1, "NUM_EPOCHS": 1, "OPTIMIZER": "adam_onecycle",
            "LR": 0.003, "WEIGHT_DECAY": 0.00001, "GRAD_NORM_CLIP": 32,
        },
    }
    cfg_path = tmp_path / "tiny_model.yaml"
    cfg_path.write_text(yaml.safe_dump(model_cfg))
    return cfg_path, data_cfg


def _dataset(data_cfg, training=True, n=8):
    return SyntheticDataset(n=n, dataset_cfg=data_cfg,
                            class_names=["Vehicle", "Pedestrian", "Cyclist"],
                            training=training)


@pytest.mark.slow
def test_train_ckpt_resume_eval(tmp_path):
    from tools import train as train_cli
    from tools import test as test_cli
    from cpd_tpu.utils.checkpoint import list_checkpoints
    import cpd_tpu.config as config_mod

    cfg_path, data_cfg = _tiny_cfgs(tmp_path)
    out = tmp_path / "out"

    # 1 epoch of training, 2 steps (8 devices -> global batch 8 -> 1 step/epoch)
    config_mod.cfg.clear()
    state = train_cli.main([
        "--cfg_file", str(cfg_path), "--output_dir", str(out),
        "--debug_steps", "2", "--log_every", "1", "--fix_random_seed",
    ], dataset=_dataset(data_cfg, training=True))
    ckpts = list_checkpoints(out / "ckpt")
    assert len(ckpts) == 1
    step_after_first = int(state.step)
    assert step_after_first >= 1

    # resume: runs epoch 1+ starting from the saved state
    config_mod.cfg.clear()
    state2 = train_cli.main([
        "--cfg_file", str(cfg_path), "--output_dir", str(out),
        "--debug_steps", "1", "--log_every", "1", "--epochs", "2",
    ], dataset=_dataset(data_cfg, training=True))
    assert int(state2.step) > step_after_first

    # eval the saved checkpoint through the test CLI
    config_mod.cfg.clear()
    result = test_cli.main([
        "--cfg_file", str(cfg_path), "--output_dir", str(out / "eval"),
        "--ckpt", str(ckpts[-1][1]), "--debug_steps", "1",
    ], dataset=_dataset(data_cfg, training=False, n=8))
    assert isinstance(result, dict)
    # synthetic random model: APs exist (values near 0)
    assert any("Vehicle" in k for k in result)
