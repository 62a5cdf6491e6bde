"""Probe: full-ladder rulebook build time (the production inference path).

Times ONE jitted build_branch_rulebooks call at bench scale (batch 1,
90k voxelizer cap, (80, 48, 24, 20)k ladder caps), i.e. everything the
detector builds per frame before the convs run: subm books for 4 stages,
3 strided books + conv_out, and (with --train) the inverse books.

Used to A/B lookup-dispatch changes (e.g. grouped vs per-run bitmap row
fetches) against the recorded operating point.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r4_books.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--train", action="store_true",
                    help="include the inverse (transpose) books")
    ap.add_argument("--per-sample", action="store_true",
                    help="build books per sample (python-unrolled) instead "
                         "of one vmapped batch build")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import build_branch_rulebooks
    from cpd_tpu.models.detector import keys_from_frame
    from cpd_tpu.ops.sparse import GridSpec
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize_batch
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    rng = np.random.default_rng(0)
    b = args.batch
    spec = VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                (0.1, 0.1, 0.15), 90_000)
    grid = GridSpec(spec.grid_size[0], spec.grid_size[1],
                    spec.grid_size[2] + 1)
    pts = jnp.asarray(np.stack(
        [make_lidar_frame(rng, 200_000)[0] for _ in range(b)]))
    frame = voxelize_batch(pts, spec, jnp.ones((b, 200_000), bool))
    keys = keys_from_frame(frame, grid)
    caps = (80_000, 48_000, 24_000, 20_000)

    if args.per_sample:
        # per-sample book builds: the SAME program on (1, V) slices, python-
        # unrolled over the batch -- probes whether the 2x batched-gather
        # lowering penalty (PER_SAMPLE_GATHER_MIN_IDX, exp_r3_flat_gather)
        # also afflicts the vmapped rulebook builds at train batch sizes.
        def fn_body(k):
            outs = [build_branch_rulebooks(k[i:i + 1], grid, caps,
                                           with_transpose=args.train)
                    for i in range(b)]
            return jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        fn = jax.jit(fn_body)
    else:
        fn = jax.jit(lambda k: build_branch_rulebooks(
            k, grid, caps, with_transpose=args.train))

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    t0 = time.perf_counter()
    out = fn(keys)
    sync(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    out = fn(keys)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(keys)
    sync(out)
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    tag = "train (incl inverse)" if args.train else "eval"
    print(f"full-ladder rulebooks b{b} {tag}: {dt:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
