"""Probe 11: RoI head train-mode forward+backward cost, standalone.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_roi_train.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import stage_grids
    from cpd_tpu.models.roi_head import VoxelRCNNProtoHead
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY

    grid = GridSpec(1504, 1504, 42)
    sg = stage_grids(grid)
    b, n_rois, n_gt = 4, 500, 64
    rng = np.random.default_rng(0)

    def mk_keys(g, n_act, cap):
        out = []
        for _ in range(b):
            k = np.sort(rng.choice(g.num_cells, n_act, replace=False).astype(np.int64)).astype(np.int32)
            out.append(np.concatenate([k, np.full(cap - n_act, INVALID_KEY, np.int32)]))
        return jnp.asarray(np.stack(out))

    backbone_out = {}
    for name, c in (("x_conv3", 64), ("x_conv4", 128)):
        keys = mk_keys(sg[name], 18000, 20000)
        feats = jnp.asarray(rng.normal(size=(b, 20000, c)).astype(np.float32)).astype(jnp.bfloat16)
        backbone_out[name] = (feats, keys, sg[name])
        backbone_out[name + "_mm"] = (feats + 0.01, keys, sg[name])

    def mk_boxes(n):
        z = np.zeros((b, n, 7), np.float32)
        z[..., :2] = rng.uniform(-70, 70, (b, n, 2))
        z[..., 2] = rng.uniform(-1, 2, (b, n))
        z[..., 3:6] = rng.uniform(1, 5, (b, n, 3))
        z[..., 6] = rng.uniform(-3, 3, (b, n))
        return jnp.asarray(z)

    proposals = {
        "rois": mk_boxes(n_rois),
        "roi_scores": jnp.asarray(rng.uniform(0, 1, (b, n_rois)).astype(np.float32)),
        "roi_labels": jnp.asarray(rng.integers(1, 4, (b, n_rois)).astype(np.int32)),
        "roi_valid": jnp.ones((b, n_rois), bool),
    }
    gt = jnp.concatenate([mk_boxes(n_gt),
                          jnp.asarray(rng.integers(1, 4, (b, n_gt, 1)).astype(np.float32))], -1)
    batch = {
        "gt_boxes": gt,
        "gt_valid": jnp.ones((b, n_gt), bool),
        "css_score": jnp.asarray(rng.uniform(0.3, 1, (b, n_gt)).astype(np.float32)),
        "cur_it": jnp.zeros((), jnp.float32),
    }

    head = VoxelRCNNProtoHead(num_rois=n_rois, roi_per_image=130, mm=True, remat=True,
                              scale_grids=sg)
    variables = head.init({"params": jax.random.PRNGKey(0),
                           "sampling": jax.random.PRNGKey(1),
                           "dropout": jax.random.PRNGKey(2)},
                          proposals, backbone_out, batch, True)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a); sync(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        sync(out)
        print(f"{name:34s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms", flush=True)

    def fwd(v):
        out = head.apply(v, proposals, backbone_out, batch, True,
                         rngs={"sampling": jax.random.PRNGKey(1),
                               "dropout": jax.random.PRNGKey(2)})
        loss, _ = head.apply(v, out, batch, method=VoxelRCNNProtoHead.get_loss)
        return loss

    bench(jax.jit(fwd), "roi head train fwd+loss", variables)
    bench(jax.jit(jax.grad(lambda p: fwd({"params": p}))), "roi head train grad",
          variables["params"])


if __name__ == "__main__":
    main()
