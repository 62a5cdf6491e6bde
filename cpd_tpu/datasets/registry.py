"""Dataset registry (parity: cpd/datasets/__init__.py:14 __all__ dict)."""
from __future__ import annotations

_REGISTRY = {}


def register_dataset(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def build_dataset(dataset_cfg, class_names, training, root_path=None, logger=None, **kw):
    name = dataset_cfg["DATASET"]
    # late imports so optional deps (waymo/kitti readers) don't break the core
    if name not in _REGISTRY:
        from . import waymo_unsupervised  # noqa: F401
        from . import kitti  # noqa: F401
    cls = _REGISTRY[name]
    return cls(dataset_cfg=dataset_cfg, class_names=class_names, training=training,
               root_path=root_path, logger=logger, **kw)
