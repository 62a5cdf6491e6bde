"""Probe: attribute the BEV+RPN stage's ~11.7 ms (roofline2 residual).

roofline2 measured the stage's conv MXU work at ~1-2 ms (each 188^2 conv2d
runs near peak) yet the in-path delta is 11.7 ms. This times the two flax
submodules whole (BaseBEVBackbone, CenterHead) plus micro-variants that
isolate BN+bias+relu overhead and the deblock transpose convs, all with the
fori-loop-slope + full-consume method of exp_r5_roofline2.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r5_bev.py
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k-hi", type=int, default=24)
    ap.add_argument("--k-lo", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    import jax.lax as lax
    import jax.numpy as jnp

    from cpd_tpu.models.detector import VoxelRCNN

    rng = np.random.default_rng(0)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])

    def consume(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def dep(x, s):
        return jnp.where(s > jnp.float32(3.0e38), x + jnp.ones((), x.dtype), x)

    def loop_time(body, state):
        fns = {k: jax.jit(lambda s, k=k: lax.fori_loop(0, k, body, s))
               for k in (args.k_lo, args.k_hi)}
        for f in fns.values():
            sync(f(state))
        ests = []
        for _ in range(args.reps):
            ts = {}
            for k in (args.k_lo, args.k_hi):
                t0 = time.perf_counter()
                sync(fns[k](state))
                ts[k] = time.perf_counter() - t0
            ests.append((ts[args.k_hi] - ts[args.k_lo])
                        / (args.k_hi - args.k_lo))
        return float(np.median(ests))

    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=90_000,
        backbone_caps=(80_000, 48_000, 24_000, 20_000),
        mm=False, num_rois=500, num_rois_test=200, roi_per_image=130,
        dense_tail=True,
    )
    from cpd_tpu.utils.synthetic import make_lidar_frame

    pts = np.stack([make_lidar_frame(rng, 200_000)[0]])
    batch = {"points": jnp.asarray(pts),
             "points_valid": jnp.ones((1, 200_000), bool)}
    variables = jax.jit(lambda r: model.init(
        {"params": r, "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, False))(jax.random.PRNGKey(0))

    h = w = 188
    bev_in = jnp.asarray(rng.normal(0, 1, (1, h, w, 256)), jnp.bfloat16)

    def record(name, t):
        print(f"  {name:30s} {t*1e3:7.2f} ms", flush=True)
        return t

    # whole BEV backbone
    def body_bb(i, x):
        out = model.apply(variables, x, False,
                          method=lambda m, xx, t: m.bev_backbone(xx, t))
        return dep(x, consume(out))
    t_bev = record("BaseBEVBackbone (whole)", loop_time(body_bb, bev_in))

    # whole CenterHead conv stack
    bev_out = model.apply(variables, bev_in, False,
                          method=lambda m, xx, t: m.bev_backbone(xx, t))
    bev_out = jnp.asarray(bev_out)

    def body_head(i, x):
        out = model.apply(variables, x, False,
                          method=lambda m, xx, t: m.dense_head(xx, t))
        return dep(x, consume(out))
    t_head = record("CenterHead convs (whole)", loop_time(body_head, bev_out))

    # micro: conv alone vs conv+BN(eval)+bias+relu at the block-1 shape
    x1 = jnp.asarray(rng.normal(0, 1, (1, h, w, 128)), jnp.bfloat16)
    wc = jnp.asarray(rng.normal(0, 1, (3, 3, 128, 128)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(1, 0.1, (128,)), jnp.float32)
    shift = jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32)

    def conv(x, ww):
        return jax.lax.conv_general_dilated(
            x, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def body_c(i, ww):
        return dep(ww, consume(conv(x1, ww)))
    t_c = record("conv2d 128ch alone", loop_time(body_c, wc))

    def body_cbn(i, ww):
        o = conv(x1, ww)
        o = (o.astype(jnp.float32) * scale + shift).astype(jnp.bfloat16)
        o = jax.nn.relu(o)
        return dep(ww, consume(o))
    t_cbn = record("conv2d + BN(eval)+relu", loop_time(body_cbn, wc))

    # deblock: ConvTranspose 94->188 (2x up, 256->128)
    x2 = jnp.asarray(rng.normal(0, 1, (1, h // 2, w // 2, 256)), jnp.bfloat16)
    wt = jnp.asarray(rng.normal(0, 1, (2, 2, 256, 128)), jnp.bfloat16)

    def body_t(i, ww):
        o = jax.lax.conv_transpose(
            x2, ww, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        return dep(ww, consume(o))
    t_de = record("deblock conv_transpose 2x", loop_time(body_t, wt))

    print(f"\nBEV backbone {t_bev*1e3:.2f} + head {t_head*1e3:.2f} = "
          f"{(t_bev+t_head)*1e3:.2f} ms of the ~11.7 ms in-path stage")
    print(f"BN+relu overhead per 128ch conv: {(t_cbn-t_c)*1e3:.3f} ms "
          f"(x ~23 convs with BN in the stage)")
    print(f"deblock: {t_de*1e3:.2f} ms each (x2)")


if __name__ == "__main__":
    main()
