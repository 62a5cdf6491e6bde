import yaml

from cpd_tpu.config import ConfigDict, cfg_from_list, cfg_from_yaml_file


def test_yaml_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump({
        "DATASET": "WaymoUnsupervisedDataset",
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
        "NESTED": {"A": 1, "B": 2},
    }))
    child = tmp_path / "child.yaml"
    child.write_text(yaml.safe_dump({
        "_BASE_CONFIG_": str(base),
        "NESTED": {"B": 3, "C": 4},
        "EXTRA": True,
    }))
    cfg = cfg_from_yaml_file(str(child))
    assert cfg.DATASET == "WaymoUnsupervisedDataset"
    assert cfg.NESTED.A == 1 and cfg.NESTED.B == 3 and cfg.NESTED.C == 4
    assert cfg.EXTRA is True
    assert cfg.TAG == "child"


def test_cfg_from_list_overrides():
    cfg = ConfigDict({"MODEL": {"NAME": "VoxelRCNN", "LR": 0.003}, "EPOCHS": 20})
    cfg_from_list(["MODEL.LR", "0.001", "EPOCHS", "5", "MODEL.NEW.DEEP", "[1,2]"], cfg)
    assert cfg.MODEL.LR == 0.001
    assert cfg.EPOCHS == 5
    assert cfg.MODEL.NEW.DEEP == [1, 2]


def test_attribute_write_and_to_dict():
    cfg = ConfigDict()
    cfg.A = {"B": 1}
    assert cfg.A.B == 1
    d = cfg.to_dict()
    assert d == {"A": {"B": 1}}
