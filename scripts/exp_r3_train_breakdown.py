"""Round-3 train-step micro-breakdown: books vs conv fwd+bwd vs the rest.

The attribution ladder (exp_r3_train_attrib.py) gave subtractive variant
costs (full 3.51 s, MM ~1.52 s, RoI ~1.08 s at batch 4, remat off). This
probe times the CONSTITUENTS directly, each as its own small jit:

  vox           voxelize both views (batch 4)
  books_main    build_branch_rulebooks(with_transpose=True)        batch 4
  books_mm      same, with_conv_out=False (light branch)           batch 4
  books_packed  ONE build at batch 8 (main+mm keys concatenated)   batch 8
  bb_grad_main  grad of the mm=False backbone (books + GEMM fwd+bwd)
  bb_grad_both  grad of the mm=True backbone (both branches)

books_packed vs (books_main + books_mm) answers whether folding the two
siamese branches' rulebook builds into one batch-axis call amortizes the
latency-bound build phase (VERDICT r2 item 4 suggests packing rows).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_r3_train_breakdown.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=200_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny caps/points for a CPU correctness smoke")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import VoxelResBackBone8x, build_branch_rulebooks
    from cpd_tpu.models.detector import keys_from_frame
    from cpd_tpu.ops.sparse import GridSpec
    from cpd_tpu.ops.voxelizer import VoxelizerSpec, voxelize_batch
    from cpd_tpu.utils.common import enable_compile_cache
    from cpd_tpu.utils.synthetic import make_lidar_frame

    enable_compile_cache()
    b, p = args.batch, args.points
    caps = (80_000, 48_000, 24_000, 20_000)
    max_vox = 90_000
    if args.tiny:
        p, caps, max_vox = 4_000, (2_000, 1_200, 600, 500), 3_000
    rng = np.random.default_rng(0)
    spec = VoxelizerSpec.create((-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
                                (0.1, 0.1, 0.15), max_vox)
    grid = GridSpec(spec.grid_size[0], spec.grid_size[1], spec.grid_size[2] + 1)

    def mk_points():
        return jnp.asarray(np.stack([make_lidar_frame(rng, p)[0] for _ in range(b)]))

    pts0, pts1 = mk_points(), mk_points()
    pv = jnp.ones((b, p), bool)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    def timeit(fn, *a, label="", iters=args.iters):
        fj = jax.jit(fn)
        t0 = time.perf_counter()
        out = fj(*a)
        sync(out)
        compile_t = time.perf_counter() - t0
        out = fj(*a)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fj(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:>14s}: {dt:8.1f} ms  (compile {compile_t:.0f}s)", flush=True)
        return out

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    frame0 = voxelize_batch(pts0, spec, pv)
    frame1 = voxelize_batch(pts1, spec, pv)
    keys0 = keys_from_frame(frame0, grid)
    keys1 = keys_from_frame(frame1, grid)
    sync((keys0, keys1))

    if want("vox"):
        timeit(lambda a0, a1: (voxelize_batch(a0, spec, pv).features,
                               voxelize_batch(a1, spec, pv).features),
               pts0, pts1, label="vox(2 views)")
    if want("books_main"):
        timeit(lambda k: build_branch_rulebooks(k, grid, caps, with_transpose=True),
               keys0, label="books_main")
    if want("books_mm"):
        timeit(lambda k: build_branch_rulebooks(k, grid, caps, with_transpose=True,
                                                with_conv_out=False),
               keys1, label="books_mm")
    if want("books_packed"):
        kp = jnp.concatenate([keys0, keys1], axis=0)
        timeit(lambda k: build_branch_rulebooks(k, grid, caps, with_transpose=True),
               kp, label="books_packed")

    feats0, feats1 = frame0.features, frame1.features

    def bb_loss(mm):
        model = VoxelResBackBone8x(grid=grid, caps=caps, mm=mm, remat=False)

        def loss_fn(params, f0, k0, f1, k1):
            out = model.apply(
                {"params": params}, f0, k0, True,
                *((f1, k1) if mm else (None, None)),
                mutable=["batch_stats"])[0]
            tot = 0.0
            for k, v in out.items():
                if k == "encoded_bev":
                    tot = tot + jnp.mean(jnp.square(v.astype(jnp.float32)))
                else:
                    tot = tot + jnp.mean(jnp.square(v[0].astype(jnp.float32)))
            return tot

        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), feats0, keys0, True,
            *((feats1, keys1) if mm else (None, None))))()
        sync(variables)
        grad_fn = jax.grad(loss_fn)
        return grad_fn, variables["params"]

    if want("bb_grad_main"):
        gfn, params = bb_loss(False)
        timeit(lambda pr, f0, k0: gfn(pr, f0, k0, None, None),
               params, feats0, keys0, label="bb_grad_main")
    if want("bb_grad_both"):
        gfn, params = bb_loss(True)
        timeit(gfn, params, feats0, keys0, feats1, keys1, label="bb_grad_both")


if __name__ == "__main__":
    main()
