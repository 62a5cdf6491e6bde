"""Benchmark: flagship detector inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (the reference publishes no throughput, BASELINE.md):
the reference detector is a Voxel R-CNN variant; Voxel R-CNN reports
25.2 FPS on KITTI frames on an RTX 2080 Ti (Deng et al., "Voxel R-CNN",
AAAI 2021, Table 6). CPD runs the same architecture at Waymo scale --
1504x1504x40 grid / ~130k voxels vs KITTI's 1408x1600x40 / ~16k voxels, a
~5-8x larger sparse workload -- plus the larger 150-proposal second stage,
on an RTX 3090 (~1.5x a 2080 Ti). 25.2 x 1.5 / 6.5 / 1.2 ~= 4.8, rounded up
generously to 10 frames/s/GPU as a conservative (hard-to-beat) baseline.
``vs_baseline`` = our frames/sec/chip divided by 10; north star >= 5.0.

Frames: lidar-realistic synthetic (cpd_tpu/utils/synthetic.py -- BEAM-
STRUCTURED returns: ground rings per downward beam, az x elev surface
patches; ~60-66k occupied stage-0 voxels from 200k points, matching real
Waymo occupancy at (0.1, 0.1, 0.15) voxels).
Batch: default 1. RE-MEASURED round 5 (2026-08-21, v5e, with the round-4
per-sample-unrolled gather lowerings and the audited 90k caps — both of
which postdate the original round-2 finding): frames/s/chip = 8.15 (b=1)
vs 7.05 (b=2) vs 6.82 (b=4); 8.28 at b=1 after the r5 voxelizer
sorted-scatter hint. Batching still does NOT amortize: the
per-sample unroll makes b=N literally N sequential frame pipelines in one
program, XLA does not overlap them (the phases contend for the same HBM
path), and the extra live activations only add pressure. Batch 1 is the
per-chip operating point; scale-out is data-parallel across chips.
``--batch`` remains for experiments.

Caps: sized from the MEASURED stage occupancy of the beam-structured frames
(scripts/exp_r2g_occupancy.py, 6-seed max: stage0 66.2k, down2 60.3k,
down3 30.0k, down4 13.5k, conv_out 10.3k) with >= 1.3x headroom:
voxelizer 90k (1.36x); ladder (80k, 48k, 24k, 20k). The audit below asserts
no stage saturates its cap on any benched frame -- truncation-free static
caps produce BIT-IDENTICAL outputs to the uncapped (dynamic-shape)
computation, so the measured number carries no silent accuracy loss. (The
dataset configs keep the reference's MAX_NUMBER_OF_VOXELS=150000 guard for
real data; these are the audited bench operating points.)
"""
import argparse
import json
import sys
import time

import numpy as np

REFERENCE_FPS_PER_CHIP_ESTIMATE = 10.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-dense-tail", action="store_true",
                    help="run stage 4 + conv_out on the sparse rulebook path "
                         "instead of the default dense MXU tail")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cpd_tpu.models.detector import VoxelRCNN
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    from cpd_tpu.utils.synthetic import make_lidar_frame

    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=90_000,
        backbone_caps=(80_000, 48_000, 24_000, 20_000),  # audited, see docstring
        mm=False,
        num_rois=500,
        num_rois_test=200,
        roi_per_image=130,
        dense_tail=not args.no_dense_tail,
    )
    b, p = args.batch, 200_000
    rng = np.random.default_rng(0)
    pts = np.stack([make_lidar_frame(rng, p)[0] for _ in range(b)])
    batch = {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((b, p), bool),
    }
    # jitted init: eager flax init dispatches thousands of ops one by one
    # over the axon tunnel (~minutes at batch 1, tens of minutes with the
    # batch>1 per-sample-unrolled builders); one compiled program is minutes
    # faster even counting its compile. Init on a BATCH-1 slice: parameter
    # shapes depend only on channels, so every --batch variant shares one
    # cached init program.
    init_batch = {"points": batch["points"][:1],
                  "points_valid": batch["points_valid"][:1]}
    variables = jax.jit(lambda r: model.init(
        {"params": r, "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        init_batch, False,
    ))(jax.random.PRNGKey(0))
    predict = jax.jit(lambda v, x: model.apply(v, x, method=VoxelRCNN.predict))

    def sync(o):
        # force a readback: block_until_ready does not synchronize under the
        # axon-tunneled TPU runtime
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    # cap-occupancy audit: no backbone stage may saturate its cap on any
    # frame (a saturated cap would buy throughput with silent truncation)
    from cpd_tpu.models.backbone3d import build_branch_rulebooks
    from cpd_tpu.models.detector import keys_from_frame
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize_batch

    spec = VoxelizerSpec.create(model.point_cloud_range, model.voxel_size,
                                model.max_voxels)
    frame = voxelize_batch(batch["points"], spec, batch["points_valid"])
    from cpd_tpu.ops.sparse import GridSpec

    grid = GridSpec(spec.grid_size[0], spec.grid_size[1], spec.grid_size[2] + 1)
    keys = keys_from_frame(frame, grid)
    rbs = jax.jit(lambda k: build_branch_rulebooks(
        k, grid, model.backbone_caps))(keys)
    occ0 = int(np.asarray((keys != np.iinfo(np.int32).max).sum(axis=-1)).max())
    occ = {name: int(np.asarray(rbs[name].out_valid.sum(axis=-1)).max())
           for name in ("down2", "down3", "down4", "conv_out")}
    caps = dict(zip(("down2", "down3", "down4", "conv_out"), model.backbone_caps))
    print(f"stage occupancy / cap: stage0 ({occ0}, {model.max_voxels}), "
          f"{ {k: (occ[k], caps[k]) for k in occ} }", file=sys.stderr)
    assert occ0 < model.max_voxels, f"voxel cap saturated: {occ0}"
    for k in occ:
        assert occ[k] < caps[k], f"cap saturated at {k}: {occ[k]}/{caps[k]}"

    out = predict(variables, batch)
    sync(out)  # compile + warmup
    out = predict(variables, batch)
    sync(out)

    iters = args.iters
    t0 = time.perf_counter()
    for _ in range(iters):
        out = predict(variables, batch)
    sync(out)
    dt = time.perf_counter() - t0
    fps = iters * b / dt
    print(json.dumps({
        "metric": "waymo_scale_inference_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REFERENCE_FPS_PER_CHIP_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
