"""Pallas fused gather-GEMM kernels for the sparse-conv im2col path.

STATUS (kept for round 3+): correct in interpret mode (tests/test_pallas_conv.py)
but NOT in production -- Mosaic (jax 0.9.0) rejects every in-kernel gather
formulation probed on the real chip (scripts/exp_r2h_gather2.py,
exp_r2i_lane_gather.py): fancy int row indexing ("Cannot do int indexing on
TPU"), take_along_axis along axis 0 (AssertionError in lowering), and the
lane-transposed dynamic gather take_along_axis(tableT, idx, axis=-1)
(AssertionError; its XLA lowering outside pallas is also 100x slow). The
production conv instead uses the measured-fastest XLA formulations
(sparse.py::_gather_gemm): ONE flattened (B*N*K,)-row gather below
FLAT_GATHER_MAX_IDX total indices, K per-tap (N,)-row gathers above it,
+ one GEMM with a bf16 result.

If/when Mosaic grows a vectorized VMEM row-gather, these kernels remove the
remaining HBM round-trip of the im2col tensor:
  * feature table resident in VMEM (all CPD stages fit: 150k x 16 ... 20k x 128),
  * rows gathered right before the MXU contraction,
  * the (V, K*Cin) im2col tensor never exists in HBM.

All kernels are shape-static; callers pad row counts to TILE multiples.
Falls back to interpret mode off-TPU (tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# default row tile; 256 rows x 27 taps = 6912 gathered rows per grid step
TILE = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(x, tile, axis=1):
    n = x.shape[axis]
    pad = (-n) % tile
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def gather_gemm(table, idx, found, w_flat, compute_dtype=jnp.bfloat16):
    """Fused masked im2col gather + GEMM.

    table: (B, V, Cin); idx/found: (B, N, K); w_flat: (K*Cin, Cout)
    -> (B, N, Cout) float32.
    """
    b, v, cin = table.shape
    _, n0, k = idx.shape
    cout = w_flat.shape[-1]
    idx, n0 = _pad_rows(idx, TILE)
    found, _ = _pad_rows(found, TILE)
    n = idx.shape[1]
    ct = table.astype(compute_dtype)
    cw = w_flat.astype(compute_dtype)

    def kernel(idx_ref, found_ref, table_ref, w_ref, out_ref):
        idxs = idx_ref[0]                       # (TILE, K)
        g = table_ref[0][idxs.reshape(-1), :]   # (TILE*K, Cin) row gather in VMEM
        g = g.reshape(TILE, k, cin)
        g = jnp.where(found_ref[0][..., None], g, 0)
        out_ref[0] = jnp.dot(
            g.reshape(TILE, k * cin), w_ref[:],
            preferred_element_type=jnp.float32,
        )

    out = pl.pallas_call(
        kernel,
        grid=(b, n // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, k), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, k), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, cin), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * cin, cout), lambda bb, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, cout), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), jnp.float32),
        interpret=_interpret(),
    )(idx, found, ct, cw)
    return out[:, :n0]


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def gather_gemm_dw(table, idx, found, g_out, compute_dtype=jnp.bfloat16):
    """dW of the fused conv: sum over (b, rows) of gathered-im2col^T @ dY.

    table: (B, V, Cin); idx/found: (B, N, K); g_out: (B, N, Cout)
    -> (K*Cin, Cout) float32 (caller reshapes to (K, Cin, Cout)).
    Accumulates across the whole grid into one VMEM-resident output block.
    """
    b, v, cin = table.shape
    _, n0, k = idx.shape
    cout = g_out.shape[-1]
    idx, _ = _pad_rows(idx, TILE)
    found, _ = _pad_rows(found, TILE)    # padded rows: found=False -> no contribution
    g_out, _ = _pad_rows(g_out, TILE)
    n = idx.shape[1]
    ct = table.astype(compute_dtype)
    cg = g_out.astype(compute_dtype)

    def kernel(idx_ref, found_ref, table_ref, g_ref, out_ref):
        bb = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((bb == 0) & (i == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        idxs = idx_ref[0]
        gt = table_ref[0][idxs.reshape(-1), :].reshape(TILE, k, cin)
        gt = jnp.where(found_ref[0][..., None], gt, 0)
        part = jax.lax.dot_general(
            gt.reshape(TILE, k * cin), g_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K*Cin, Cout)
        out_ref[:] = out_ref[:] + part

    return pl.pallas_call(
        kernel,
        grid=(b, n // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, k), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, k), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, cin), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, cout), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * cin, cout), lambda bb, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * cin, cout), jnp.float32),
        interpret=_interpret(),
    )(idx, found, ct, cg)


def vmem_fits(v: int, cin: int, bytes_per_elem: int = 2, budget: int = 12 * 2**20) -> bool:
    """Whether a (V, Cin) table fits the VMEM residency budget."""
    return v * cin * bytes_per_elem <= budget
