"""Measure TRUE downsample-stage occupancy on lidar-realistic frames.

down2/down3 saturated their (80k, 60k) caps on the realistic frame -- this
probe rebuilds the ladder with oversized caps to read the real active-site
counts, over several frame seeds, so the model-default caps can be set with
measured headroom instead of guessed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2g_occupancy.py
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=4)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import build_branch_rulebooks
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY
    from cpd_tpu.utils.synthetic import make_lidar_frame

    grid = GridSpec(1504, 1504, 41)
    V = 150_000
    caps = (160_000, 120_000, 80_000, 80_000)  # oversized to read true counts

    fn = jax.jit(lambda k: build_branch_rulebooks(k, grid, caps))
    for seed in range(args.seeds):
        rng = np.random.default_rng(seed)
        pts, _ = make_lidar_frame(rng, 200_000)
        ijk = np.floor((pts[:, :3] + np.array([75.2, 75.2, 2.0])) /
                       np.array([0.1, 0.1, 0.15])).astype(np.int64)
        okm = ((ijk >= 0).all(1) & (ijk[:, 0] < grid.nx) & (ijk[:, 1] < grid.ny)
               & (ijk[:, 2] < grid.nz))
        key = np.unique(((ijk[okm, 2] * grid.ny + ijk[okm, 1]) * grid.nx
                         + ijk[okm, 0]).astype(np.int32))[:V]
        kk = np.full(V, INVALID_KEY, np.int32)
        kk[:key.shape[0]] = key
        rbs = fn(jnp.asarray(kk)[None])
        occ = {n: int(np.asarray(rbs[n].out_valid.sum()))
               for n in ("down2", "down3", "down4", "conv_out")}
        print(f"seed {seed}: stage0 {key.shape[0]}, {occ}", flush=True)


if __name__ == "__main__":
    main()
