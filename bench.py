"""Benchmark: flagship detector inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference (hailanyi/CPD, 4x RTX 3090, PyTorch+spconv)
publishes no throughput (BASELINE.md). We use an ESTIMATED reference
inference rate of 10 frames/sec/GPU for a VoxelRCNN-class two-stage detector
at Waymo scale (batch 4/GPU training, ~2.5 it/s typical for this family on a
3090); vs_baseline = our frames/sec/chip divided by that estimate. The
north-star target is >= 5.0.
"""
import json
import time

import numpy as np

REFERENCE_FPS_PER_CHIP_ESTIMATE = 10.0


def main():
    import jax
    import jax.numpy as jnp
    from cpd_tpu.models.detector import VoxelRCNN

    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=150_000,
        backbone_caps=(80_000, 40_000, 20_000, 20_000),
        mm=False,
        num_rois=500,
        num_rois_test=200,
        roi_per_image=130,
    )
    b, p = 1, 200_000
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [
            rng.uniform(-74, 74, (b, p, 2)),
            rng.uniform(-2, 4, (b, p, 1)),
            rng.uniform(0, 1, (b, p, 2)),
        ],
        axis=-1,
    ).astype(np.float32)
    batch = {
        "points": jnp.asarray(pts),
        "points_valid": jnp.ones((b, p), bool),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch, False,
    )
    predict = jax.jit(lambda v, x: model.apply(v, x, method=VoxelRCNN.predict))

    def sync(o):
        # force a readback: block_until_ready does not synchronize under the
        # axon-tunneled TPU runtime
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    out = predict(variables, batch)
    sync(out)  # compile + warmup
    out = predict(variables, batch)
    sync(out)

    iters = 10
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
