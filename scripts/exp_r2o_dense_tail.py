"""Dense-tail probe: can the deep backbone stages run as DENSE conv3d?

At 8x-downsampled resolutions the dense grids are small enough that a dense
3x3x3 conv on the MXU may beat the sparse gather-GEMM path even at ~1-2%
occupancy, because the MXU runs at ~200 TFLOP/s bf16 while the sparse path is
HBM-transaction-bound on its im2col gathers. Submanifold semantics are
preserved exactly: unoccupied cells hold zero features, so the dense conv sum
equals the sparse one at occupied sites; a mask multiply after each conv
keeps padding cells at zero (and BN stats use the mask).

Measures, per stage shape of the CPD ladder (grid 1504x1504x41 base):
  - dense subm conv3d (3^3, SAME) fwd, bf16
  - dense strided conv3d (3^3, s2)
  - scatter sparse->dense and gather dense->sparse at stage caps
  - a full dense stage (strided + 2 residual blocks = 5 convs)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_r2o_dense_tail.py
"""
import argparse
import time

import numpy as np


def timeit(fn, sync, iters=5):
    out = fn()
    sync(out)
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from cpd_tpu.utils.common import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    # stage shapes (D=z, H=y, W=x) after each strided conv of the ladder
    stages = {
        # name: (D, H, W, C, occupied)
        "x_conv2": (21, 752, 752, 32, 60_000),
        "x_conv3": (11, 376, 376, 64, 30_000),
        "x_conv4": (6, 188, 188, 128, 14_000),
    }
    rng = np.random.default_rng(0)

    for name, (d, h, w, c, occ) in stages.items():
        x = jnp.asarray(rng.standard_normal((1, d, h, w, c)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.05, jnp.bfloat16)
        mask = jnp.asarray(rng.random((1, d, h, w, 1)) < occ / (d * h * w),
                           jnp.bfloat16)

        def conv(x, k, stride=(1, 1, 1), pad="SAME"):
            return jax.lax.conv_general_dilated(
                x, k, stride, pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.bfloat16)

        subm = jax.jit(lambda x: conv(x, k) * mask)
        t = timeit(lambda: subm(x), sync, args.iters)
        gf = d * h * w * 27 * c * c * 2 / 1e9
        print(f"{name} ({d}x{h}x{w}x{c}): subm dense conv {t*1e3:7.2f} ms "
              f"({gf:.0f} GFLOP, {gf/t/1e3:.0f} TFLOP/s)")

        stage = jax.jit(lambda x: ((lambda y: nnrelu_chain(y, k, mask))(x)))

        def nnrelu_chain(y, k, mask):
            # strided entry + 2 residual blocks (4 subm convs)
            y = jax.nn.relu(conv(y, k))
            for _ in range(2):
                idn = y
                y = jax.nn.relu(conv(y, k) * mask)
                y = conv(y, k) * mask
                y = jax.nn.relu(y + idn)
            return y

        t = timeit(lambda: stage(x), sync, args.iters)
        print(f"{name}: full dense stage (5 convs)       {t*1e3:7.2f} ms")

        # scatter occupied rows into the dense grid + gather back
        rows = jnp.asarray(rng.standard_normal((occ, c)), jnp.bfloat16)
        cells = jnp.asarray(
            np.sort(rng.choice(d * h * w, occ, replace=False)).astype(np.int32))

        def to_dense(rows, cells):
            flat = jnp.zeros((d * h * w, c), jnp.bfloat16)
            return flat.at[cells].set(rows).reshape(1, d, h, w, c)

        td = jax.jit(to_dense)
        t = timeit(lambda: td(rows, cells), sync, args.iters)
        print(f"{name}: scatter->dense                   {t*1e3:7.2f} ms")
        dn = td(rows, cells)
        back = jax.jit(lambda dn, cells: dn.reshape(d * h * w, c)[cells])
        t = timeit(lambda: back(dn, cells), sync, args.iters)
        print(f"{name}: gather->sparse                   {t*1e3:7.2f} ms")

        # strided conv to the next stage
        if name != "x_conv4":
            k2 = jnp.asarray(rng.standard_normal((3, 3, 3, c, 2 * c)) * 0.05,
                             jnp.bfloat16)
            st = jax.jit(lambda x: conv(x, k2, (2, 2, 2)))
            t = timeit(lambda: st(x), sync, args.iters)
            print(f"{name}: strided dense conv (s2)          {t*1e3:7.2f} ms")
        print()


if __name__ == "__main__":
    main()
