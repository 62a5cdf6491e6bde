"""Model layer: functional detector stack built from flax.linen modules.

Mirrors the reference registry contract (cpd/models/__init__.py:9
``build_network`` and detectors/detector3d_template.py) with a TPU-first
design: batch dicts of fixed-capacity arrays flow through jitted pure
functions; no module ever sees a dynamic shape.
"""
from .detector import build_network, VoxelRCNN  # noqa: F401


def load_data_to_device(batch):
    """Host batch -> device arrays (parity: cpd/models/__init__.py:16
    ``load_data_to_gpu``): numeric arrays move, metadata stays host-side."""
    import numpy as np

    import jax.numpy as jnp

    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) or hasattr(v, "dtype"):
            out[k] = jnp.asarray(v)
    return out


def model_fn_decorator(model):
    """(parity: cpd/models/__init__.py:27) returns fn(variables, batch, rngs)
    -> (loss, tb_dict, disp_dict) running the jitted loss step."""
    import jax

    def model_func(variables, batch, rngs=None):
        rngs = rngs or {"sampling": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
        (loss, tb), _ = model.apply(
            variables, load_data_to_device(batch), method=type(model).loss_step,
            mutable=["batch_stats"], rngs=rngs,
        )
        disp = {k: float(v) for k, v in tb.items()}
        return loss, tb, disp

    return model_func
