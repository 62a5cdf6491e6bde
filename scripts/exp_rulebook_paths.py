"""Probe 9: LUT vs rank-join threshold for rulebook building.

Times jit(build_branch_rulebooks) with DENSE_LUT_MAX_CELLS at:
  100M (all stages LUT -- current), 50M (stage-0 rank-join), 0 (all join).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_rulebook_paths.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cpd_tpu.models import backbone3d
    from cpd_tpu.ops import sparse
    from cpd_tpu.ops.sparse import GridSpec, INVALID_KEY

    grid = GridSpec(1504, 1504, 42)
    caps = (80_000, 40_000, 20_000, 20_000)
    rng = np.random.default_rng(0)
    V = 150_000
    k = np.sort(rng.choice(grid.num_cells, int(V * 0.95), replace=False).astype(np.int64)).astype(np.int32)
    keys = jnp.asarray(np.concatenate([k, np.full(V - len(k), INVALID_KEY, np.int32)]))[None]

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    for thresh in (100_000_000, 50_000_000, 0):
        def fn(kk, _t=thresh):  # distinct function identity per threshold
            return backbone3d.build_branch_rulebooks(kk, grid, caps,
                                                     lut_max_cells=_t)

        fj = jax.jit(fn)
        t0 = time.perf_counter()
        out = fj(keys)
        sync(out)
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            out = fj(keys)
        sync(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"threshold {thresh:>11d}: {dt*1e3:8.1f} ms  (compile {compile_t:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
