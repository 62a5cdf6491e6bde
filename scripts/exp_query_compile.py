"""Probe 7: does the LUT-path compute_pool_queries compile on the real TPU?

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_query_compile.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import stage_grids
    from cpd_tpu.models.roi_head import compute_pool_queries
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY

    grid = GridSpec(1504, 1504, 42)
    sg = stage_grids(grid)
    rng = np.random.default_rng(0)

    def mk_keys(g, n_act, cap, b):
        out = []
        for _ in range(b):
            k = np.sort(rng.choice(g.num_cells, n_act, replace=False).astype(np.int64)).astype(np.int32)
            out.append(np.concatenate([k, np.full(cap - n_act, INVALID_KEY, np.int32)]))
        return jnp.asarray(np.stack(out))

    for b, n_rois in ((1, 200), (4, 130)):
        k3 = mk_keys(sg["x_conv3"], 18000, 20000, b)
        k4 = mk_keys(sg["x_conv4"], 18000, 20000, b)
        f3 = jnp.asarray(rng.normal(size=(b, 20000, 64)).astype(np.float32))
        f4 = jnp.asarray(rng.normal(size=(b, 20000, 128)).astype(np.float32))
        sf = {"x_conv3": (f3, k3), "x_conv4": (f4, k4)}
        rois = np.zeros((b, n_rois, 7), np.float32)
        rois[..., :2] = rng.uniform(-70, 70, (b, n_rois, 2))
        rois[..., 2] = rng.uniform(-1, 2, (b, n_rois))
        rois[..., 3:6] = rng.uniform(1, 5, (b, n_rois, 3))
        rois = jnp.asarray(rois)
        specs = (("x_conv3", 4, ((2, 2, 2), 0.4), ((4, 4, 4), 0.8)),
                 ("x_conv4", 8, ((2, 2, 2), 0.8), ((4, 4, 4), 1.6)))
        fn = jax.jit(lambda r, s: compute_pool_queries(
            r, s, sg, specs, (0.1, 0.1, 0.15), (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
            6, 16, ""))
        t0 = time.perf_counter()
        out = fn(rois, sf)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        print(f"B={b} compile+run OK in {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(rois, sf)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        print(f"B={b} steady: {(time.perf_counter()-t0)/10*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
