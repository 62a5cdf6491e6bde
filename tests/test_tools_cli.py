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


SHIPPED_CONFIGS = [
    "tools/cfgs/models/voxel_rcnn_cproto_center.yaml",
    "tools/cfgs/models/voxel_rcnn_dbscan_single_train.yaml",
    "tools/cfgs/models/voxel_rcnn_oyster_single_train.yaml",
    "tools/cfgs/models/voxel_rcnn_cproto_center_kitti.yaml",
    # PillarVFE + PointPillarScatter topology (no 3D backbone): exercises
    # the VFE/MAP_TO_BEV NAME slots end to end
    "tools/cfgs/models/pointpillar_dbscan_single_train.yaml",
]


def _shrink_cfg(cfg):
    """Scale a shipped full-size config down to tiny synthetic capacities."""
    d = cfg["DATA_CONFIG"]
    d["DATASET"] = "SyntheticDataset"
    d["POINT_CLOUD_RANGE"] = [-8.0, -8.0, -2.0, 8.0, 8.0, 4.0]
    d["POINT_CAP"] = 2048
    d["GT_CAP"] = 16
    d["STAGES"] = 2
    m = cfg["MODEL"]
    is_pillars = m.get("VFE", {}).get("NAME") == "PillarVFE"
    for proc in d["DATA_PROCESSOR"]:
        if proc["NAME"] == "transform_points_to_voxels":
            # pillar grids keep a single full-height z cell
            proc["VOXEL_SIZE"] = [0.5, 0.5, 6.0] if is_pillars else [0.25, 0.25, 0.15]
            proc["MAX_NUMBER_OF_VOXELS"] = {"train": 2048, "test": 2048}
    if "BACKBONE_3D" in m:
        m["BACKBONE_3D"]["VOXEL_CAPS"] = [1024, 512, 256, 256]
    dense_post = m["DENSE_HEAD"].setdefault("POST_PROCESSING", {})
    dense_post["NMS_CONFIG"] = {"NMS_THRESH": 0.8, "NMS_PRE_MAXSIZE": 512,
                                "NMS_POST_MAXSIZE": 64}
    if "ROI_HEAD" in m:
        m["ROI_HEAD"]["TARGET_CONFIG"]["ROI_PER_IMAGE"] = 16
        m["ROI_HEAD"].setdefault("ROI_GRID_POOL", {})["GRID_SIZE"] = 4
        nms = m["ROI_HEAD"].get("NMS_CONFIG")
        if nms:
            nms["TRAIN"]["NMS_POST_MAXSIZE"] = 64
            nms["TEST"]["NMS_POST_MAXSIZE"] = 32
    m.setdefault("POST_PROCESSING", {})["NMS_CONFIG"] = {
        "NMS_THRESH": 0.3, "NMS_PRE_MAXSIZE": 512, "NMS_POST_MAXSIZE": 64}
    cfg["OPTIMIZATION"]["BATCH_SIZE_PER_GPU"] = 1
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize("cfg_file", SHIPPED_CONFIGS)
def test_shipped_config_train_and_eval(tmp_path, cfg_file):
    """Every shipped model yaml must train (2 debug steps) and eval through
    the CLIs -- exercises the NAME-driven registry end to end."""
    from tools import train as train_cli
    from tools import test as test_cli
    import cpd_tpu.config as config_mod
    from cpd_tpu.config import cfg_from_yaml_file, ConfigDict

    repo = Path(__file__).resolve().parent.parent
    cfg = _shrink_cfg(cfg_from_yaml_file(repo / cfg_file, ConfigDict()))
    cfg.pop("TAG", None)
    cfg.pop("EXP_GROUP_PATH", None)
    class_names = list(cfg["CLASS_NAMES"])
    small = tmp_path / "model.yaml"
    small.write_text(yaml.safe_dump(cfg.to_dict()))
    data_cfg = cfg["DATA_CONFIG"].to_dict()

    def ds(training, n=8):
        return SyntheticDataset(n=n, dataset_cfg=data_cfg,
                                class_names=class_names, training=training)

    out = tmp_path / "out"
    config_mod.cfg.clear()
    train_cli.main([
        "--cfg_file", str(small), "--output_dir", str(out),
        "--debug_steps", "2", "--log_every", "1", "--fix_random_seed",
    ], dataset=ds(True))
    from cpd_tpu.utils.checkpoint import list_checkpoints
    ckpts = list_checkpoints(out / "ckpt")
    assert ckpts
    config_mod.cfg.clear()
    result = test_cli.main([
        "--cfg_file", str(small), "--output_dir", str(out / "eval"),
        "--ckpt", str(ckpts[-1][1]), "--debug_steps", "1",
    ], dataset=ds(False, n=8))
    assert isinstance(result, dict)


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


def test_strip_checkpoint_roundtrip(tmp_path):
    """tools/strip_checkpoint.py keeps params+batch_stats, drops opt_state
    (save_model_paras.py parity: the deploy artifact carries weights only)."""
    import numpy as np
    from types import SimpleNamespace
    from cpd_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
    from tools.strip_checkpoint import strip_checkpoint

    state = SimpleNamespace(
        params={"dense": {"kernel": np.ones((4, 4), np.float32)}},
        batch_stats={"bn": {"mean": np.zeros(4, np.float32)}},
        opt_state={"mu": {"dense": {"kernel": np.full((4, 4), 0.5, np.float32)}}},
        step=7,
    )
    path = save_checkpoint(tmp_path / "ckpt", state, epoch=3)
    out = strip_checkpoint(path)
    restored = load_checkpoint(out)
    assert "opt_state" not in restored
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["dense"]["kernel"]), state.params["dense"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(restored["batch_stats"]["bn"]["mean"]), state.batch_stats["bn"]["mean"])
    assert int(restored["epoch"]) == 3
