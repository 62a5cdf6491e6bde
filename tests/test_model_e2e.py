"""End-to-end smoke tests of the full detector on a tiny grid."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpd_tpu.models.detector import VoxelRCNN


TINY = dict(
    num_classes=3,
    point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 4.0),
    voxel_size=(0.25, 0.25, 0.15),  # grid 64x64x40(+1=41): BEV 8x8, z ladder 41/21/11/5/2
    max_voxels=2048,
    backbone_caps=(1024, 512, 256, 256),
    num_rois=64,
    roi_per_image=16,
    remat=False,  # tiny shapes: skip remat (halves CPU test time)
)


def make_batch(rng, b=2, p=2048, n_gt=8, with_proto=True):
    pts = np.concatenate(
        [
            rng.uniform(-8, 8, (b, p, 2)),
            rng.uniform(-2, 4, (b, p, 1)),
            rng.uniform(0, 1, (b, p, 2)),
        ],
        axis=-1,
    ).astype(np.float32)
    gt = np.zeros((b, n_gt, 8), np.float32)
    gt[..., 0:2] = rng.uniform(-6, 6, (b, n_gt, 2))
    gt[..., 2] = rng.uniform(-1, 1, (b, n_gt))
    gt[..., 3:6] = rng.uniform(1.0, 4.0, (b, n_gt, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, n_gt))
    gt[..., 7] = rng.integers(1, 4, (b, n_gt))
    batch = {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((b, p), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_valid": jnp.ones((b, n_gt), bool),
        "css_score": jnp.asarray(rng.uniform(0.3, 1.0, (b, n_gt)).astype(np.float32)),
        "cur_it": jnp.asarray(100.0, jnp.float32),
    }
    if with_proto:
        batch["points1"] = jnp.asarray(pts + 0.01)
        batch["points1_valid"] = jnp.ones((b, p), bool)
    return batch


@pytest.fixture(scope="module")
def model_and_vars():
    model = VoxelRCNN(**TINY)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch, True,
    )
    return model, variables, batch


def test_train_forward_and_loss(model_and_vars):
    model, variables, batch = model_and_vars
    (loss, tb), _ = model.apply(
        variables, batch, method=VoxelRCNN.loss_step,
        rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(loss)), tb
    for k in ("rpn_loss", "rcnn_cls0", "rcnn_reg0", "rcnn_cls1", "proto_loss"):
        assert k in tb, sorted(tb)
        assert np.isfinite(float(tb[k])), (k, tb[k])


def test_eval_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    preds = model.apply(variables, batch, method=VoxelRCNN.predict)
    b = batch["points"].shape[0]
    assert preds["pred_boxes"].shape[0] == b
    assert preds["pred_boxes"].shape[-1] == 7
    assert preds["pred_scores"].shape == preds["pred_labels"].shape
    assert np.all(np.isfinite(np.asarray(preds["pred_boxes"]))), "non-finite boxes"


def test_gradients_flow(model_and_vars):
    model, variables, batch = model_and_vars
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (loss, _), _ = model.apply(
            {"params": p, **other}, batch, method=VoxelRCNN.loss_step,
            rngs={"sampling": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
            mutable=["batch_stats"],
        )
        return loss

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # both siamese branches and both towers must receive gradient
    norms = {k: float(jnp.linalg.norm(jnp.concatenate([jnp.ravel(x) for x in jax.tree_util.tree_leaves(v)])))
             for k, v in grads.items()}
    assert any("backbone" in k for k in norms)
    total = sum(norms.values())
    assert total > 0


def test_dense_tail_detector_end_to_end():
    """The exact bench-default configuration (dense_tail=True) at detector
    level: init + predict + train loss/grads must run. Round 2 shipped a
    bench default that only had backbone-level coverage and crashed at
    detector.py (UnboundLocalError on the sparse-branch-only enc_grid)."""
    model = VoxelRCNN(**{**TINY, "dense_tail": True})
    rng = np.random.default_rng(7)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch, True,
    )
    preds = model.apply(variables, batch, method=VoxelRCNN.predict)
    assert preds["pred_boxes"].shape[-1] == 7
    assert np.all(np.isfinite(np.asarray(preds["pred_boxes"])))

    # training path: down2/down3 still run sparse and need their transpose
    # rulebooks (gather-only backward) even when the tail is dense
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (loss, _), _ = model.apply(
            {"params": p, **other}, batch, method=VoxelRCNN.loss_step,
            rngs={"sampling": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
