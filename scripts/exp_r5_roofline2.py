"""Per-stage roofline v2 (VERDICT r4 weak #1) — dispatch-free component floors.

exp_r5_roofline.py's first cut had two calibration bugs (kept for
provenance; its MEASURED stage table and MFU/HBM figures were fine):
  * per-row gather costs were per-CALL timings, polluted by the ~3.2 ms
    host->device launch latency of the axon tunnel (a 244k-row op read 13
    ns/row of pure overhead);
  * the dense conv3d "MXU rate" was measured on a degenerate tiny-z shape
    (2.1 TF/s) and then applied to the whole tail, yielding a 439 ms "floor"
    for a stage that measures 62 ms.

This version times every component DEVICE-SIDE via a lax.fori_loop slope:
    t_per_iter = (t(K_HI iters) - t(K_LO iters)) / (K_HI - K_LO)
with a full-sum consume of every output leaf plus a never-true (but not
provably false) where() dependency between iterations — XLA can neither
hoist, CSE, nor narrow the body (consuming only out[0] lets it shrink a
gather to one row / drop dead sort operands, which is how v2.0 measured
down4 at an impossible 1674 TF/s) — and the slope cancels launch latency
and program-invariant overhead exactly. Components are the PRODUCTION ops on the
REAL bench rulebooks/keys (sparse._gather_gemm on rbs['subm1'].idx, the
builders themselves, lax.sort at voxelizer shape, dense-tail conv3d at its
exact shapes, pool.voxel_query_multi on the real key sets), so index
locality, cap padding, and mode selection all match the shipped pipeline.

floor(stage) = sum of its components timed standalone (each perfectly
overlapped with nothing); residual = measured - floor = serialization +
fusion-boundary + non-overlap cost that a better schedule/kernel could
still recover.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_r5_roofline2.py
"""
import argparse
import time

import numpy as np

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k-hi", type=int, default=24)
    ap.add_argument("--k-lo", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU correctness pass: 2/1-iter loops, 1 rep, "
                         "skip the measured-stage timing loops (numbers "
                         "meaningless; validates every component traces)")
    args = ap.parse_args()
    if args.smoke:
        args.k_hi, args.k_lo, args.reps = 2, 1, 1

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    import jax.lax as lax
    import jax.numpy as jnp

    from cpd_tpu.models.backbone3d import build_branch_rulebooks, stage_grids
    from cpd_tpu.models.detector import VoxelRCNN, keys_from_frame
    from cpd_tpu.ops import pool, sparse
    from cpd_tpu.ops.voxelizer import voxelize_batch
    from cpd_tpu.utils.synthetic import make_lidar_frame

    rng = np.random.default_rng(0)

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])

    def consume(out):
        """Full reduction over EVERY output leaf. Consuming only out[0]
        lets XLA narrow the producer (a gather feeding a single-element
        slice fetches ONE row; a variadic sort drops dead operands) -- the
        v2.0 run measured the dense down4 conv at an impossible 1674 TF/s
        this way. A sum forces every element to be produced and fuses into
        the producer's epilogue (no extra HBM pass)."""
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def dep(x, s):
        """Loop-carry dependency on the consumed scalar via a never-true
        (but not provably false) predicate: blocks hoisting/CSE/DCE without
        arithmetic XLA could simplify away."""
        pred = s > jnp.float32(3.0e38)
        return jnp.where(pred, x + jnp.ones((), x.dtype), x)

    def loop_time(body, state):
        """Device-side seconds per body() via fori_loop slope (launch
        latency and program-invariant overhead cancel in the difference);
        median over interleaved reps."""
        fns = {k: jax.jit(lambda s, k=k: lax.fori_loop(0, k, body, s))
               for k in (args.k_lo, args.k_hi)}
        for f in fns.values():
            sync(f(state))  # compile + warm
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

    # ---- bench-identical model + frame --------------------------------
    model = VoxelRCNN(
        num_classes=3,
        point_cloud_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=90_000,
        backbone_caps=(80_000, 48_000, 24_000, 20_000),
        mm=False, num_rois=500, num_rois_test=200, roi_per_image=130,
        dense_tail=True,
    )
    p = 200_000
    pts = np.stack([make_lidar_frame(rng, p)[0]])
    batch = {"points": jnp.asarray(pts), "points_valid": jnp.ones((1, p), bool)}
    variables = jax.jit(lambda r: model.init(
        {"params": r, "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, False))(jax.random.PRNGKey(0))

    bound = model.bind(variables)
    vox_spec, grid, caps = bound.vox_spec, bound.grid, model.backbone_caps
    g = stage_grids(grid)

    vox = jax.jit(lambda P, V: voxelize_batch(P, vox_spec, V))
    frame = vox(batch["points"], batch["points_valid"])
    keys = jax.jit(lambda f: keys_from_frame(f, grid))(frame)
    rb_fn = jax.jit(lambda k: build_branch_rulebooks(k, grid, caps,
                                                     dense_tail=True))
    rbs = rb_fn(keys)
    feats0 = frame.features  # (1, 90k, C_pt)
    c_pt = feats0.shape[-1]
    occ0 = int(np.asarray((keys != sparse.INVALID_KEY).sum(axis=-1)).max())
    occ1 = int(np.asarray(rbs["down2"].out_valid.sum(axis=-1)).max())
    occ2 = int(np.asarray(rbs["down3"].out_valid.sum(axis=-1)).max())
    print(f"occupancy: stage0 {occ0}  stage1 {occ1}  stage2 {occ2}  "
          f"point feats C={c_pt}", flush=True)

    # ================= measured per-stage times (same deltas as v1) ======
    def timeit(fn, iters=16):
        if args.smoke:
            out = fn(); sync(out)
            return 1e-3  # placeholder; smoke validates tracing only
        out = fn(); sync(out)
        out = fn(); sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters

    t_vox = timeit(lambda: vox(batch["points"], batch["points_valid"]))
    t_rb = timeit(lambda: rb_fn(keys))

    def bb(feats, k):
        return model.apply(variables, feats, k, False,
                           method=lambda m, f, kk, t: m.backbone(f, kk, t))
    bb_j = jax.jit(bb)
    bb_j(frame.features, keys)
    t_bb = timeit(lambda: bb_j(frame.features, keys))

    model_norh = model.clone(with_roi_head=False)
    vars_norh = {"params": {k: v for k, v in variables["params"].items()
                            if k != "roi_head"},
                 "batch_stats": {k: v for k, v in
                                 variables.get("batch_stats", {}).items()
                                 if k != "roi_head"}}
    fwd_norh = jax.jit(lambda v, x: model_norh.apply(v, x, False))
    fwd_norh(vars_norh, batch)
    t_norh = timeit(lambda: fwd_norh(vars_norh, batch))
    fwd = jax.jit(lambda v, x: model.apply(v, x, False))
    fwd(variables, batch)
    t_fwd = timeit(lambda: fwd(variables, batch))
    pred = jax.jit(lambda v, x: model.apply(v, x, method=VoxelRCNN.predict))
    pred(variables, batch)
    t_pred = timeit(lambda: pred(variables, batch))

    # ================= components ========================================
    class PrintingDict(dict):
        """Print each component as it lands so a late failure still leaves
        the computed part of the table in the log."""

        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(f"  [comp] {k:26s} {v*1e3:7.2f} ms", flush=True)

    comp = PrintingDict()

    # ---- voxelizer: the 200k multi-operand sort is the irreducible core
    sk = jnp.asarray(rng.integers(0, 1 << 30, p), jnp.int32)
    svs = tuple(jnp.asarray(rng.normal(0, 1, p), jnp.float32)
                for _ in range(c_pt))

    def body_sort(i, st):
        k0, vs = st
        out = lax.sort((k0,) + vs, num_keys=1)
        return dep(out[0], consume(out)), out[1:]
    comp["vox.sort200k"] = loop_time(body_sort, (sk, svs))
    # segment-sum + dedup scatter traffic (analytic): points read+write once
    # per phase, voxel table written once
    comp["vox.traffic"] = (p * c_pt * 4 * 3 + 90_000 * c_pt * 4) / PEAK_HBM_BPS

    # ---- rulebook builders, each standalone (production functions) ------
    # Each stage LUT is built ONCE (its own component, matching the shared-
    # per-stage LUT in production); the pure builders then consume it as a
    # closed-over constant -- the body still loop-depends on the keys, so
    # nothing is hoisted, and no LUT build is double counted.
    k1 = rbs["down2"].out_keys
    k2 = rbs["down3"].out_keys
    LUT0 = sparse.build_bitmap_lut_batched(keys, g["x_conv1"])
    LUT1 = sparse.build_bitmap_lut_batched(k1, g["x_conv2"])
    LUT2 = sparse.build_bitmap_lut_batched(k2, g["x_conv3"])

    def builder_component(name, fn, kin):
        def body(i, k):
            out = fn(k)
            return dep(k, consume(out))
        comp[name] = loop_time(body, kin)

    builder_component("books.lut0", lambda k: sparse.build_bitmap_lut_batched(
        k, g["x_conv1"]), keys)
    builder_component("books.lut1", lambda k: sparse.build_bitmap_lut_batched(
        k, g["x_conv2"]), k1)
    builder_component("books.lut2", lambda k: sparse.build_bitmap_lut_batched(
        k, g["x_conv3"]), k2)
    builder_component("books.subm1", lambda k: sparse.build_subm_rulebook_batched(
        k, g["x_conv1"], lut=LUT0), keys)
    builder_component("books.down2", lambda k: sparse.build_conv_rulebook_batched(
        k, g["x_conv1"], (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[0],
        lut=LUT0)[0], keys)
    builder_component("books.subm2", lambda k: sparse.build_subm_rulebook_batched(
        k, g["x_conv2"], lut=LUT1), k1)
    builder_component("books.down3", lambda k: sparse.build_conv_rulebook_batched(
        k, g["x_conv2"], (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[1],
        lut=LUT1)[0], k1)
    builder_component("books.subm3", lambda k: sparse.build_subm_rulebook_batched(
        k, g["x_conv3"], lut=LUT2), k2)

    # ---- sparse convs: production _gather_gemm on the real rulebooks ----
    def conv_component(name, rb, v_rows, cin, cout, n_convs):
        f0 = jnp.asarray(rng.normal(0, 1, (1, v_rows, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 1, (27, cin, cout)), jnp.bfloat16)
        idx = rb.idx if rb.idx.ndim == 3 else rb.idx[None]
        found = rb.found if rb.found.ndim == 3 else rb.found[None]

        def body(i, f):
            out = sparse._gather_gemm(f, idx, found, w, jnp.bfloat16,
                                      jnp.bfloat16, win_run=3)
            return dep(f, consume(out))
        t1 = loop_time(body, f0)
        comp[name] = t1 * n_convs
        # GEMM-only at the same shape for the gather/GEMM split
        n_out = idx.shape[1]
        a = jnp.asarray(rng.normal(0, 1, (n_out, 27 * cin)), jnp.bfloat16)
        wg = jnp.asarray(rng.normal(0, 1, (27 * cin, cout)), jnp.bfloat16)

        def body_g(i, ww):
            out = jax.lax.dot_general(a, ww, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.bfloat16)
            return dep(ww, consume(out))
        comp[name + ".gemm_only"] = loop_time(body_g, wg) * n_convs
        return t1

    # v_rows for gathers: the feature table each conv reads (cap-padded)
    v0 = keys.shape[-1]          # 90k stage-0 table
    conv_component("convs.s1_input", rbs["subm1"], v0, c_pt, 16, 1)
    conv_component("convs.s1_res", rbs["subm1"], v0, 16, 16, 4)
    conv_component("convs.down2", rbs["down2"], v0, 16, 32, 1)
    conv_component("convs.s2_res", rbs["subm2"], caps[0], 32, 32, 4)
    conv_component("convs.down3", rbs["down3"], caps[0], 32, 64, 1)
    conv_component("convs.s3_res", rbs["subm3"], caps[1], 64, 64, 4)
    # BN+ReLU+residual-add traffic for the 15 sparse convs (analytic):
    # read+write activations ~3x per conv at bf16
    bn_bytes = (5 * v0 * 16 + 1 * caps[0] * 32 + 4 * caps[0] * 32
                + 1 * caps[1] * 64 + 4 * caps[1] * 64) * 2 * 3
    comp["convs.bn_traffic"] = bn_bytes / PEAK_HBM_BPS

    # ---- dense tail at exact shapes ------------------------------------
    g2, g3, g_out = g["x_conv3"], g["x_conv4"], g["encoded"]
    feats3 = jnp.asarray(rng.normal(0, 1, (caps[1], 64)), jnp.bfloat16)

    def body_td(i, f):
        d = sparse.to_dense(f, k2[0], g2, 64)
        return dep(f, consume(d))
    comp["tail.to_dense"] = loop_time(body_td, feats3)

    xd3 = jnp.asarray(rng.normal(0, 1, (1, g2.nz, g2.ny, g2.nx, 64)),
                      jnp.bfloat16)
    wd4 = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 64, 128)), jnp.bfloat16)

    def body_d4(i, w):
        out = jax.lax.conv_general_dilated(
            xd3, w, (2, 2, 2), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16)
        return dep(w, consume(out))
    comp["tail.down4"] = loop_time(body_d4, wd4)
    o4 = jax.eval_shape(lambda: jax.lax.conv_general_dilated(
        xd3, wd4, (2, 2, 2), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))).shape
    fl_down4 = 2 * int(np.prod(o4[:4])) * 27 * 64 * 128

    xd4 = jnp.asarray(rng.normal(0, 1, (1, o4[1], o4[2], o4[3], 128)),
                      jnp.bfloat16)
    wd44 = jnp.asarray(rng.normal(0, 1, (3, 3, 3, 128, 128)), jnp.bfloat16)

    def body_s4(i, w):
        out = jax.lax.conv_general_dilated(
            xd4, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16)
        return dep(w, consume(out))
    t_s4 = loop_time(body_s4, wd44)
    comp["tail.res4 (4x)"] = t_s4 * 4
    fl_s4 = 2 * int(np.prod(o4[:4])) * 27 * 128 * 128

    wco = jnp.asarray(rng.normal(0, 1, (3, 1, 1, 128, 128)), jnp.bfloat16)

    def body_co(i, w):
        out = jax.lax.conv_general_dilated(
            xd4, w, (2, 1, 1), [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16)
        return dep(w, consume(out))
    comp["tail.conv_out"] = loop_time(body_co, wco)
    fl_co = 2 * int(np.prod(o4[:4]) // 2) * 3 * 128 * 128
    # dense BN/mask/extraction traffic (analytic)
    cells4 = int(np.prod(o4[1:4]))
    comp["tail.traffic"] = (cells4 * 128 * 2 * 8) / PEAK_HBM_BPS

    # ---- BEV + RPN: conv2d pyramid at exact shapes ---------------------
    def conv2d_component(name, h, w_, cin, cout, stride, n):
        x2 = jnp.asarray(rng.normal(0, 1, (1, h, w_, cin)), jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(0, 1, (3, 3, cin, cout)), jnp.bfloat16)

        def body(i, ww):
            out = jax.lax.conv_general_dilated(
                x2, ww, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            return dep(ww, consume(out))
        comp[name] = loop_time(body, w2) * n
        return 2 * (h // stride) * (w_ // stride) * 9 * cin * cout * n

    ny, nx = g_out.ny, g_out.nx
    bev_flops = 0
    bev_flops += conv2d_component("bev.b1_in", ny, nx, g_out.nz * 128, 128, 1, 1)
    bev_flops += conv2d_component("bev.b1", ny, nx, 128, 128, 1, 5)
    bev_flops += conv2d_component("bev.b2_in", ny, nx, 128, 256, 2, 1)
    bev_flops += conv2d_component("bev.b2", ny // 2, nx // 2, 256, 256, 1, 5)
    # deblocks (1x1-ish transpose) + center head convs, approx as 2 convs
    bev_flops += conv2d_component("bev.deblk+head", ny, nx, 256, 128, 1, 2)

    # ---- RoI head: production query + grouping + MLP -------------------
    # plausible rois: centers at occupied voxels
    n_roi = model.num_rois_test
    roi_xyz = np.zeros((n_roi, 7), np.float32)
    kk = np.asarray(keys[0][:occ0])
    sel = rng.choice(occ0, n_roi, replace=False)
    zz = kk[sel] // (grid.ny * grid.nx)
    yy = (kk[sel] // grid.nx) % grid.ny
    xx = kk[sel] % grid.nx
    roi_xyz[:, 0] = xx * 0.1 - 75.2
    roi_xyz[:, 1] = yy * 0.1 - 75.2
    roi_xyz[:, 2] = zz * 0.15 - 2.0
    roi_xyz[:, 3:6] = rng.uniform(1.5, 5, (n_roi, 3))
    rois = jnp.asarray(roi_xyz)[None]
    grid_pts = jax.vmap(lambda rb: pool.roi_grid_points(rb, 6))(rois)
    queries = grid_pts.reshape(1, n_roi * 216, 3)

    specs = (("x_conv3", 4, ((2, 2, 2), 0.4), ((4, 4, 4), 0.8), k2, caps[1]),
             ("x_conv4", 8, ((2, 2, 2), 0.8), ((4, 4, 4), 1.6), None, caps[2]))
    # x_conv4 keys from the dense-tail extraction: recompute via mask walk
    bb_out = bb_j(frame.features, keys)
    keys4 = bb_out["x_conv4"][1]
    q_total = 0.0
    for name, ds, gr0, gr1, kstage, cap in specs:
        kst = kstage if kstage is not None else keys4
        gg = g[name]
        lut_s = sparse.build_bitmap_lut_batched(kst, gg)
        radii = (gr0[1], gr1[1])
        qrange = tuple(max(gr0[0][d], gr1[0][d]) for d in range(3))

        def q_one(qxyz, kset, l, ds=ds, gg=gg, qrange=qrange, radii=radii):
            return pool.voxel_query_multi(
                qxyz, kset, gg, tuple(model.voxel_size),
                model.point_cloud_range, ds, qrange, radii, 16, lut=l)

        def body_q(i, q):
            # unrolled_vmap matches the production b==1 squeezed lowering
            out = pool.unrolled_vmap(q_one, (q, kst, lut_s))
            return dep(q, consume(out))
        t_q = loop_time(body_q, queries)
        comp[f"roi.query_{name}"] = t_q
        q_total += t_q
        # grouping gather: nsample=16 rows of mlp_channels=32 per query x2
        idxg = jnp.asarray(rng.integers(0, cap, (1, n_roi * 216, 16)), jnp.int32)
        pre = jnp.asarray(rng.normal(0, 1, (1, cap, 32)), jnp.bfloat16)

        def body_g2(i, pr):
            out = pr[0][idxg[0]]
            return dep(pr, consume(out))
        comp[f"roi.group_{name}"] = loop_time(body_g2, pre) * 2
    # MLP + towers flops (analytic at measured-achievable 30 TF/s):
    q_n = n_roi * 216
    mlp_flops = 2 * q_n * 16 * 32 * 32 * 2 * 2 * 2  # 2 scales x 2 groups x 2 layers
    tower_flops = 2 * n_roi * (6**3 * 64 * 256 + 256 * 256 * 4)
    comp["roi.mlp+towers"] = (mlp_flops + tower_flops) / 30e12

    # ---- decode+NMS measured directly ----------------------------------
    t_decode = max(t_pred - t_fwd, 0.0)

    # ================= report ===========================================
    print("\ncomponents (device-side, fori-loop slope):", flush=True)
    for k in comp:
        print(f"  {k:26s} {comp[k]*1e3:7.2f} ms")

    def s(prefix):
        return sum(v for kk_, v in comp.items()
                   if kk_.startswith(prefix) and not kk_.endswith("gemm_only"))

    floors = {
        "voxelize": s("vox."),
        "rulebooks(in-path 5)": s("books."),
        "convs (sparse+tail)": s("convs.") + s("tail."),
        "BEV+RPN": s("bev."),
        "RoI head": s("roi."),
    }
    meas = {
        "voxelize": t_vox,
        "rulebooks(in-path 5)": t_rb,
        "convs (sparse+tail)": t_bb - t_rb,
        "BEV+RPN": t_norh - t_bb,
        "RoI head": t_fwd - t_norh,
    }
    print(f"\n{'stage':24s} {'measured':>9s} {'floor':>9s} {'residual':>9s}")
    tot_f = 0.0
    for k in meas:
        f = floors[k]
        tot_f += f
        print(f"{k:24s} {meas[k]*1e3:8.1f}ms {f*1e3:8.1f}ms "
              f"{(meas[k]-f)*1e3:8.1f}ms")
    print(f"{'decode+NMS':24s} {t_decode*1e3:8.1f}ms {'--':>9s} {'--':>9s}")

    total = t_pred
    # frame flops: sparse convs + tail + bev (+ roi, small)
    gemm_flops = 0
    for nm, n_out, cin, cout, n in (
            ("s1i", v0, c_pt, 16, 1), ("s1r", v0, 16, 16, 4),
            ("d2", caps[0], 16, 32, 1), ("s2", caps[0], 32, 32, 4),
            ("d3", caps[1], 32, 64, 1), ("s3", caps[1], 64, 64, 4)):
        gemm_flops += 2 * n_out * 27 * cin * cout * n
    frame_flops = gemm_flops + fl_down4 + 4 * fl_s4 + fl_co + bev_flops \
        + mlp_flops + tower_flops
    # counted useful bytes: im2col window fetches (9 rows x 3*Cin x 2B per
    # conv output) + BN/residual traffic + dense-tail activations
    fetch_bytes = sum(
        n * n_out * 9 * 3 * cin * 2
        for n_out, cin, n in ((v0, c_pt, 1), (v0, 16, 4), (v0, 16, 1),
                              (caps[0], 32, 4), (caps[0], 32, 1),
                              (caps[1], 64, 4)))
    frame_bytes = fetch_bytes + bn_bytes + cells4 * 128 * 2 * 8
    print(f"\nframe: {total*1e3:.1f} ms  fps {1/total:.2f}  "
          f"sum-of-floors {tot_f*1e3:.1f} ms "
          f"(+decode {t_decode*1e3:.1f}) -> ceiling "
          f"{1/(tot_f + t_decode):.2f} fps")
    print(f"HBM util (counted useful bytes): "
          f"{frame_bytes/total/PEAK_HBM_BPS*100:.2f}% "
          f"({frame_bytes/1e6:.0f} MB/frame counted; random-row fetches "
          f"move a full transaction per row, so real traffic is higher)")
    print(f"MFU: {frame_flops/total/PEAK_BF16_FLOPS*100:.2f}% "
          f"({frame_flops/1e9:.1f} GFLOP/frame)  "
          f"tail conv rate: down4 {fl_down4/comp['tail.down4']/1e12:.1f} TF/s, "
          f"res4 {fl_s4/(comp['tail.res4 (4x)']/4)/1e12:.1f} TF/s")
    print(f"gather/GEMM split: s1res {comp['convs.s1_res']*1e3:.1f} vs "
          f"gemm-only {comp['convs.s1_res.gemm_only']*1e3:.1f} ms; "
          f"s2 {comp['convs.s2_res']*1e3:.1f}/{comp['convs.s2_res.gemm_only']*1e3:.1f}; "
          f"s3 {comp['convs.s3_res']*1e3:.1f}/{comp['convs.s3_res.gemm_only']*1e3:.1f}")


if __name__ == "__main__":
    main()
