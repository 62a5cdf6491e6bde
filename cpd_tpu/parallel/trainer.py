"""Data-parallel training over a device mesh with pjit.

TPU-native replacement for the reference's distributed stack:
  - NCCL DDP + torch.distributed.launch (tools/train.py:59-66,142-143;
    cpd/utils/common_utils.py:115-155)  ->  one 1-D jax Mesh('data') +
    jit with NamedSharding; gradient all-reduce is implicit in the
    sharded-batch loss mean (XLA inserts the psum over ICI).
  - SyncBatchNorm (train.py:117)  ->  free under pjit: MaskedBatchNorm's
    global-batch moments ARE cross-device reductions when the batch axis is
    sharded; XLA emits the collective.
  - adam_onecycle + OneCycle LR + momentum scheduling + grad clip 32
    (tools/train_utils/optimization/__init__.py:11,39, fastai_optim.py)  ->
    optax chain with injected cosine-onecycle lr/b1 schedules.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def onecycle_momentum_schedule(total_steps: int, moms=(0.95, 0.85), pct_start: float = 0.4):
    """Cosine momentum annealing mirroring fastai OneCycle (high->low->high)."""
    hi, lo = moms
    warm = max(int(total_steps * pct_start), 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        down = hi + (lo - hi) * 0.5 * (1 - jnp.cos(jnp.pi * jnp.clip(step / warm, 0, 1)))
        up_frac = jnp.clip((step - warm) / max(total_steps - warm, 1), 0, 1)
        up = lo + (hi - lo) * 0.5 * (1 - jnp.cos(jnp.pi * up_frac))
        return jnp.where(step < warm, down, up)

    return sched


def build_optimizer(opt_cfg: Dict, total_steps: int) -> optax.GradientTransformation:
    """adam_onecycle (the CPD default) or plain adam/sgd from the same cfg keys."""
    name = opt_cfg.get("OPTIMIZER", "adam_onecycle")
    lr = float(opt_cfg.get("LR", 0.003))
    wd = float(opt_cfg.get("WEIGHT_DECAY", 1e-5))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 32))
    if name == "adam_onecycle":
        pct = float(opt_cfg.get("PCT_START", 0.4))
        div = float(opt_cfg.get("DIV_FACTOR", 10))
        moms = tuple(opt_cfg.get("MOMS", (0.95, 0.85)))
        lr_sched = optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=lr, pct_start=pct,
            div_factor=div, final_div_factor=1000.0,
        )
        b1_sched = onecycle_momentum_schedule(total_steps, moms, pct)
        inner = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_sched, b1=b1_sched, weight_decay=wd
        )
    elif name == "adam":
        inner = optax.adamw(lr, weight_decay=wd)
    elif name == "sgd":
        inner = optax.sgd(lr, momentum=float(opt_cfg.get("MOMENTUM", 0.9)))
    else:
        raise KeyError(f"unknown optimizer {name}")
    return optax.chain(optax.clip_by_global_norm(clip), inner)


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def init_state(model, batch, tx, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    variables = model.init(
        {"params": k1, "sampling": k2, "dropout": k3}, batch, True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def batch_sharding(mesh: Mesh):
    """Shard every batch array along its leading (batch) axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def make_train_step(model, mesh: Optional[Mesh] = None, donate: bool = True):
    """jitted train step; with a mesh, batch is sharded on 'data' and the
    state replicated -- XLA derives the gradient all-reduce.

    With a mesh the b>1 per-sample unrolls are disabled at trace time
    (sparse.batch_unroll_disabled): they slice the GLOBAL batch axis, so
    under a batch-sharded pjit every x[i:i+1] crosses DP shard boundaries
    and GSPMD would reshard/serialize the builds -- the batched lowerings
    partition cleanly along 'data' instead (tests/test_parallel.py)."""
    sharded = mesh is not None and mesh.size > 1

    def train_step(state: TrainState, batch, rng):
        from contextlib import nullcontext

        from ..ops import sparse
        with sparse.batch_unroll_disabled() if sharded else nullcontext():
            return _train_step_body(state, batch, rng)

    def _train_step_body(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        r1, r2 = jax.random.split(step_rng)

        def loss_fn(params):
            (loss, tb), mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                {**batch, "cur_it": state.step.astype(jnp.float32)},
                method=type(model).loss_step,
                mutable=["batch_stats"],
                rngs={"sampling": r1, "dropout": r2},
            )
            return loss, (tb, mut["batch_stats"])

        grads, (tb, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        # failure guard: skip the update when any gradient is non-finite
        # (the reference has no such protection, SURVEY.md section 5; on long
        # unsupervised runs a single bad pseudo-label batch must not kill
        # training). The skip is recorded in tb["skipped_nonfinite"].
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        new_state = state.apply_gradients(grads, new_bs)
        reverted = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old) if hasattr(new, "dtype") else new,
            new_state, state)
        # the step counter always advances (schedules must not stall)
        new_state = reverted.replace(step=new_state.step)
        tb["grad_norm"] = gnorm
        tb["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        return new_state, tb

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, bs, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Optional[Mesh] = None):
    sharded = mesh is not None and mesh.size > 1

    def eval_step(state: TrainState, batch):
        from contextlib import nullcontext

        from ..ops import sparse
        with sparse.batch_unroll_disabled() if sharded else nullcontext():
            return state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch,
                method=type(model).predict,
            )

    if mesh is None:
        return jax.jit(eval_step)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(eval_step, in_shardings=(rep, bs), out_shardings=bs)
