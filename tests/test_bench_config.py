"""Trace-level smoke of the EXACT flagship bench configuration.

Round 2 lost its perf record to a 2-line bug (detector.py UnboundLocalError
on the dense-tail default) that an abstract trace catches in seconds:
``jax.eval_shape`` runs the full model trace -- every Python-level branch,
shape rule, and name binding -- without compiling or allocating, so this
test is fast enough to gate every commit that touches detector/backbone/
bench defaults ("bench-before-merge").
"""
import jax
import jax.numpy as jnp

from cpd_tpu.models.detector import VoxelRCNN

# keep in sync with bench.py::main's model construction
BENCH_KWARGS = dict(
    num_classes=3,
    point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
    voxel_size=(0.1, 0.1, 0.15),
    max_voxels=90_000,
    backbone_caps=(80_000, 48_000, 24_000, 20_000),
    mm=False,
    num_rois=500,
    num_rois_test=200,
    roi_per_image=130,
    dense_tail=True,
)


def _trace(model, train: bool, with_proto: bool):
    b, p = 1, 200_000
    batch = {
        "points": jax.ShapeDtypeStruct((b, p, 5), jnp.float32),
        "points_valid": jax.ShapeDtypeStruct((b, p), bool),
    }
    if train:
        batch.update({
            "gt_boxes": jax.ShapeDtypeStruct((b, 64, 8), jnp.float32),
            "gt_valid": jax.ShapeDtypeStruct((b, 64), bool),
            "css_score": jax.ShapeDtypeStruct((b, 64), jnp.float32),
            "cur_it": jax.ShapeDtypeStruct((), jnp.float32),
        })
        if with_proto:
            batch["points1"] = batch["points"]
            batch["points1_valid"] = batch["points_valid"]
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.eval_shape(lambda bt: model.init(rngs, bt, train), batch)
    if train:
        out = jax.eval_shape(
            lambda v, bt: model.apply(
                v, bt, method=VoxelRCNN.loss_step, mutable=["batch_stats"],
                rngs={"sampling": jax.random.PRNGKey(3),
                      "dropout": jax.random.PRNGKey(4)}),
            variables, batch)
        (loss, tb), _ = out
        assert loss.shape == ()
        return tb
    out = jax.eval_shape(
        lambda v, bt: model.apply(v, bt, method=VoxelRCNN.predict),
        variables, batch)
    assert out["pred_boxes"].shape[-1] == 7
    return out


def test_bench_inference_config_traces():
    _trace(VoxelRCNN(**BENCH_KWARGS), train=False, with_proto=False)


def test_bench_sparse_tail_traces():
    _trace(VoxelRCNN(**{**BENCH_KWARGS, "dense_tail": False}),
           train=False, with_proto=False)


def test_flagship_train_config_traces():
    # the CPD training configuration: MM siamese + proto head + remat
    kw = {**BENCH_KWARGS, "mm": True, "remat": True}
    tb = _trace(VoxelRCNN(**kw), train=True, with_proto=True)
    assert "proto_loss" in tb
