"""Probe: stage-level decomposition of the 144.6 ms eval rulebook build.

Times each component of build_branch_rulebooks (eval: no transposes) on
lidar-realistic keys: per-stage dense-LUT builds, subm builders, strided
builders -- and inside the stage-0 strided builder, the candidate sort vs
the lookup phase.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r2e_rulebook_stages.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import build_branch_rulebooks, stage_grids
    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY
    from cpd_tpu.utils.synthetic import make_lidar_frame

    rng = np.random.default_rng(0)
    grid = GridSpec(1504, 1504, 41)
    V = 150_000
    pts, _ = make_lidar_frame(rng, 200_000)
    ijk = np.floor((pts[:, :3] + np.array([75.2, 75.2, 2.0])) /
                   np.array([0.1, 0.1, 0.15])).astype(np.int64)
    okm = ((ijk >= 0).all(1) & (ijk[:, 0] < grid.nx) & (ijk[:, 1] < grid.ny)
           & (ijk[:, 2] < grid.nz))
    key = np.unique(((ijk[okm, 2] * grid.ny + ijk[okm, 1]) * grid.nx
                     + ijk[okm, 0]).astype(np.int32))[:V]
    kk = np.full(V, INVALID_KEY, np.int32)
    kk[:key.shape[0]] = key
    keys = jnp.asarray(kk)[None]
    print(f"occupied: {key.shape[0]}")
    caps = (80_000, 60_000, 40_000, 40_000)
    g = stage_grids(grid)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def bench(fn, name, *a):
        out = fn(*a); sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        print(f"{name:44s} {(time.perf_counter()-t0)/args.iters*1e3:8.2f} ms",
              flush=True)
        return out

    j = jax.jit
    total = bench(j(lambda k: build_branch_rulebooks(k, grid, caps)),
                  "TOTAL build_branch_rulebooks (eval)", keys)

    # stage 0
    lut0 = bench(j(lambda k: sparse.build_dense_lut_batched(k, g["x_conv1"])),
                 "lut0 build (92.7M cells)", keys)
    bench(j(lambda k, l: sparse.build_subm_rulebook_batched(k, g["x_conv1"], lut=l)),
          "subm1 build", keys, lut0)
    rb_d2 = bench(j(lambda k, l: sparse.build_conv_rulebook_batched(
        k, g["x_conv1"], (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[0], lut=l)[0]),
        "down2 build (strided)", keys, lut0)
    k1 = rb_d2.out_keys
    print(f"  down2 occupancy {int(np.asarray(rb_d2.out_valid.sum()))}/{caps[0]}")

    # stage 1
    lut1 = bench(j(lambda k: sparse.build_dense_lut_batched(k, g["x_conv2"])),
                 "lut1 build (11.6M cells)", k1)
    bench(j(lambda k, l: sparse.build_subm_rulebook_batched(k, g["x_conv2"], lut=l)),
          "subm2 build", k1, lut1)
    rb_d3 = bench(j(lambda k, l: sparse.build_conv_rulebook_batched(
        k, g["x_conv2"], (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[1], lut=l)[0]),
        "down3 build (strided)", k1, lut1)
    k2 = rb_d3.out_keys
    print(f"  down3 occupancy {int(np.asarray(rb_d3.out_valid.sum()))}/{caps[1]}")

    lut2 = bench(j(lambda k: sparse.build_dense_lut_batched(k, g["x_conv3"])),
                 "lut2 build (1.45M cells)", k2)
    bench(j(lambda k, l: sparse.build_subm_rulebook_batched(k, g["x_conv3"], lut=l)),
          "subm3 build", k2, lut2)
    rb_d4 = bench(j(lambda k, l: sparse.build_conv_rulebook_batched(
        k, g["x_conv3"], (3, 3, 3), (2, 2, 2), (1, 1, 0), caps[2], lut=l)[0]),
        "down4 build (strided)", k2, lut2)
    k3 = rb_d4.out_keys
    print(f"  down4 occupancy {int(np.asarray(rb_d4.out_valid.sum()))}/{caps[2]}")

    lut3 = bench(j(lambda k: sparse.build_dense_lut_batched(k, g["x_conv4"])),
                 "lut3 build", k3)
    bench(j(lambda k, l: sparse.build_subm_rulebook_batched(k, g["x_conv4"], lut=l)),
          "subm4 build", k3, lut3)
    bench(j(lambda k, l: sparse.build_conv_rulebook_batched(
        k, g["x_conv4"], (1, 1, 3), (1, 1, 2), (0, 0, 0), caps[3], lut=l)[0]),
        "conv_out build", k3, lut3)

    # inside down2: candidate sort+unique vs tap lookups
    def cand_sort(k):
        coords = sparse.coords_from_keys(k[0], g["x_conv1"])
        valid = k[0] != INVALID_KEY
        og = g["x_conv2"]
        cand_keys = []
        z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
        for qz in range(2):
            for qy in range(2):
                for qx in range(2):
                    oz, oy, ox = (z + 1) // 2 - qz, (y + 1) // 2 - qy, (x + 1) // 2 - qx
                    ok = ((oz >= 0) & (oz < og.nz) & (oy >= 0) & (oy < og.ny)
                          & (ox >= 0) & (ox < og.nx) & valid)
                    kk2 = (oz * og.ny + oy) * og.nx + ox
                    cand_keys.append(jnp.where(ok, kk2, INVALID_KEY).astype(jnp.int32))
        cand = jnp.sort(jnp.concatenate(cand_keys))
        return cand

    bench(j(cand_sort), "  down2 candidate gen + 1.2M sort", keys)


if __name__ == "__main__":
    main()
