"""Multi-device data-parallel training on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpd_tpu.parallel import build_optimizer, init_state, make_mesh, make_train_step, make_eval_step
from cpd_tpu.parallel.trainer import onecycle_momentum_schedule


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_onecycle_momentum():
    sched = onecycle_momentum_schedule(100, (0.95, 0.85), 0.4)
    assert abs(float(sched(0)) - 0.95) < 1e-6
    assert abs(float(sched(40)) - 0.85) < 1e-6
    assert abs(float(sched(100)) - 0.95) < 1e-6


def test_optimizer_onecycle_lr_peaks():
    import optax

    tx = build_optimizer({"OPTIMIZER": "adam_onecycle", "LR": 0.003, "PCT_START": 0.4}, 100)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    # step through and ensure updates stay finite
    for _ in range(5):
        g = {"w": jnp.ones((4,))}
        up, state = tx.update(g, state, params)
        params = optax.apply_updates(params, up)
    assert np.all(np.isfinite(np.asarray(params["w"])))


def test_sharded_train_step_matches_single_device():
    """DP equivalence on the 8-device mesh, asserted in two sound tiers.

    STRICT tier -- rpn-only model (with_roi_head=False): the forward
    contains no score-driven discrete selection (CenterHead targets are
    gt-derived gaussians), so sharding can only perturb float reduction
    order in the cross-batch BN statistics. The activations are bf16
    (1 ulp = 2^-8 ~ 0.4%): a ~1e-7 stat delta flips a small subset of
    activations by one full ulp, so the sound bound is a fraction of a
    bf16 ulp on the loss -- NOT f32-noise rtol. grad_norm must also agree
    (a real DP bug -- wrong mean/sum scaling, double counting -- shifts it
    by 2-8x, far outside the ulp band).

    LOOSE tier -- full model: proposal top-k/NMS and RoI fg/bg sampling
    AMPLIFY ~1e-7 reduction-order deltas (BN batch stats sum in a
    different order under sharding) into a different discrete roi set and
    an O(10%) loss difference; exact equality is unsound for the full
    step. (The reference's DDP guarantees even less: per-GPU BN stats are
    never synced -- SyncBatchNorm is off by default, train.py:117 -- and
    each GPU samples rois from its own shard.) Assert finite losses, no
    NaN-skip, and per-step losses in the same ballpark.
    """
    import __graft_entry__ as ge
    from cpd_tpu.models.detector import VoxelRCNN

    batch = ge._make_batch(b=8, p=512, seed=1)
    tx = build_optimizer({"OPTIMIZER": "adam_onecycle", "LR": 0.003}, 100)
    mesh = make_mesh(8)

    # --- strict tier: no discrete score-driven selection in the forward
    model_rpn = VoxelRCNN(**{**ge._TINY, "with_roi_head": False})
    state0 = init_state(model_rpn, batch, tx, rng=jax.random.PRNGKey(7))
    step_single = make_train_step(model_rpn, mesh=None, donate=False)
    s1, tb1 = step_single(state0, batch, jax.random.PRNGKey(0))
    step_sharded = make_train_step(model_rpn, mesh, donate=False)
    with mesh:
        s2, tb2 = step_sharded(state0, batch, jax.random.PRNGKey(0))
    l1, l2 = float(tb1["total_loss"]), float(tb2["total_loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    np.testing.assert_allclose(l1, l2, rtol=2e-2)  # bf16-ulp band, see above
    np.testing.assert_allclose(float(tb1["grad_norm"]),
                               float(tb2["grad_norm"]), rtol=5e-2)
    f1 = jax.tree_util.tree_leaves(s1.params)
    f2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(f1, f2):
        # step-1 adam moves every param by ~+-lr*sign(grad) regardless of
        # magnitude; an ulp-band grad flip moves a param by up to 2*lr
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=8e-3)

    # --- loose tier: full model with RoI head (discrete selection inside)
    model = VoxelRCNN(**ge._TINY)
    state0 = init_state(model, batch, tx, rng=jax.random.PRNGKey(7))
    step_single = make_train_step(model, mesh=None, donate=False)
    s1, tb1 = step_single(state0, batch, jax.random.PRNGKey(0))
    step_sharded = make_train_step(model, mesh, donate=False)
    with mesh:
        s2, tb2 = step_sharded(state0, batch, jax.random.PRNGKey(0))
    l1, l2 = float(tb1["total_loss"]), float(tb2["total_loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert float(tb1["skipped_nonfinite"]) == 0.0
    assert float(tb2["skipped_nonfinite"]) == 0.0
    # same ballpark: catches gross DP breakage (wrong loss scaling, double
    # counting) without over-asserting through the discrete selections
    assert abs(l1 - l2) / max(abs(l1), abs(l2)) < 0.5


def test_eval_step_sharded():
    import __graft_entry__ as ge
    from cpd_tpu.models.detector import VoxelRCNN

    model = VoxelRCNN(**ge._TINY)
    batch = ge._make_batch(b=8, p=512, seed=2)
    tx = build_optimizer({"OPTIMIZER": "adam"}, 10)
    state = init_state(model, batch, tx)
    mesh = make_mesh(8)
    eval_step = make_eval_step(model, mesh)
    with mesh:
        preds = eval_step(state, batch)
    assert preds["pred_boxes"].shape[0] == 8
    assert np.all(np.isfinite(np.asarray(preds["pred_boxes"])))


def test_sharded_trace_disables_per_sample_unrolls():
    """ADVICE r4 (medium): b>1 per-sample unrolls slice the GLOBAL batch
    axis, which crosses DP shard boundaries under pjit -- the sharded
    trainer must trace with the BATCHED lowerings instead. Asserted via the
    trace-time unroll counter on a probe model whose loss_step runs an
    above-gate rulebook build (the full detector at gate scale would take
    minutes to trace on CPU)."""
    from flax import linen as nn

    from cpd_tpu.models.backbone3d import (BOOKS_PER_SAMPLE_MIN_VOXELS,
                                           build_branch_rulebooks)
    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.sparse import GridSpec

    grid = GridSpec(32, 32, 41)  # the _TINY ladder topology
    # the gate checks static CAPACITY (keys.shape[1]), not occupancy: pad a
    # small occupied set out to the gate so the trace stays cheap
    v_cap = BOOKS_PER_SAMPLE_MIN_VOXELS

    class Probe(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            return jnp.zeros(())

        def loss_step(self, batch):
            rbs = build_branch_rulebooks(batch["keys"], grid,
                                         (512, 256, 128, 128))
            loss = jnp.sum(rbs["down2"].out_valid.astype(jnp.float32))
            return loss, {}

    model = Probe()
    rng = np.random.default_rng(0)

    def make_keys(b):
        keys = np.full((b, v_cap), np.iinfo(np.int32).max, np.int32)
        occ = np.sort(rng.choice(32 * 32 * 40, size=400, replace=False))
        keys[:, :400] = occ[None]
        return jnp.asarray(keys)

    batch = {"keys": make_keys(8)}
    from cpd_tpu.parallel.trainer import TrainState
    import optax

    tx = optax.sgd(1e-3)
    st = TrainState(step=jnp.zeros((), jnp.int32), params={},
                    batch_stats={}, opt_state=tx.init({}), tx=tx,
                    apply_fn=model.apply)

    # unsharded: the unroll gate fires (counter increases during trace)
    sparse._UNROLL_EVENTS[0] = 0
    step = make_train_step(model, mesh=None, donate=False)
    jax.eval_shape(step, st, batch, jax.random.PRNGKey(0))
    assert sparse._UNROLL_EVENTS[0] > 0

    # sharded: the SAME scale traces with batched lowerings only
    sparse._UNROLL_EVENTS[0] = 0
    mesh = make_mesh(8)
    step_sharded = make_train_step(model, mesh=mesh, donate=False)
    with mesh:
        jax.eval_shape(step_sharded, st, batch, jax.random.PRNGKey(0))
    assert sparse._UNROLL_EVENTS[0] == 0
