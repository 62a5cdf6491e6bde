"""End-to-end train-step determinism (SURVEY section 4 test plan)."""
import numpy as np
import jax
import pytest

import __graft_entry__ as ge
from cpd_tpu.models.detector import VoxelRCNN
from cpd_tpu.parallel import build_optimizer, init_state, make_train_step


@pytest.mark.slow
def test_train_step_deterministic():
    model = VoxelRCNN(**ge._TINY)
    batch = ge._make_batch(b=2, p=512, seed=3)
    tx = build_optimizer({"OPTIMIZER": "adam_onecycle", "LR": 0.003}, 50)

    def run():
        state = init_state(model, batch, tx, rng=jax.random.PRNGKey(11))
        step = make_train_step(model, mesh=None, donate=False)
        losses = []
        for _ in range(2):
            state, tb = step(state, batch, jax.random.PRNGKey(0))
            losses.append(float(tb["total_loss"]))
        return losses, state

    l1, s1 = run()
    l2, s2 = run()
    assert l1 == l2, (l1, l2)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
