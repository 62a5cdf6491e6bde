"""Sparse 3D backbones on the rulebook substrate.

TPU-native re-design of the reference's spconv backbones
(cpd/models/backbones_3d/spconv_backbone.py): VoxelBackBone8x (:138) and the
residual VoxelResBackBone8x (:398) -- the CPD backbone -- including the
``MM: True`` siamese branch that processes the proto-completed point cloud
in training (:560-598). Key differences from the torch/spconv design:

* Rulebooks (the sparsity-pattern neighbor tables) are built ONCE per stage
  and shared by every submanifold conv in that stage -- the functional
  equivalent of spconv's ``indice_key`` reuse (spconv_backbone.py:160-193).
* Both siamese branches run inside one jit; XLA overlaps their GEMMs.
* BatchNorm is masked (padding voxels excluded) with torch semantics
  (eps 1e-3, momentum 0.01) and optional mesh-axis sync (SyncBN parity).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse
from ..ops.sparse import GridSpec, Rulebook
from .norm import MaskedBatchNorm


class DenseCtx(NamedTuple):
    """Dense-grid stand-in for a Rulebook: the conv modules below accept
    either. ``mask`` is the OUTPUT-site occupancy (B, D, H, W); stride and
    padding are in conv DHW (z, y, x) order. Used by the dense-tail path
    (deep stages run as dense MXU conv3d -- see ResBranch.dense_tail)."""

    mask: jnp.ndarray
    stride: Tuple[int, int, int]
    padding: Tuple[Tuple[int, int], ...]


def _dense_conv(features, w_taps, kernel_xyz, ctx: DenseCtx, compute_dtype):
    """3-D dense conv with the rulebook tap-order weight layout.

    ``w_taps`` is the sparse-path (K, Cin, Cout) kernel whose taps follow
    _kernel_offsets order (dz outer, dy, dx inner) -- exactly a
    (kz, ky, kx, Cin, Cout) DHWIO reshape, so sparse and dense paths share
    one parameter tensor (checkpoint-compatible either way)."""
    kx, ky, kz = kernel_xyz
    cin, cout = w_taps.shape[-2:]
    w = w_taps.reshape(kz, ky, kx, cin, cout)
    cd = compute_dtype or features.dtype
    return jax.lax.conv_general_dilated(
        features.astype(cd), w.astype(cd), ctx.stride, list(ctx.padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=cd)


def _downsample_mask(mask, kernel_xyz, stride_xyz, pad_xyz):
    """Occupancy of a strided conv's output sites: every output cell whose
    receptive field touches an occupied input (SparseConv3d's active-set
    rule, sparse.py::_build_conv_rulebook_jit)."""
    kx, ky, kz = kernel_xyz
    sx, sy, sz = stride_xyz
    px, py, pz = pad_xyz
    ones = jnp.ones((kz, ky, kx, 1, 1), jnp.bfloat16)
    out = jax.lax.conv_general_dilated(
        mask[..., None].astype(jnp.bfloat16), ones, (sz, sy, sx),
        [(pz, pz), (py, py), (px, px)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.bfloat16)
    return out[..., 0] > 0


# below this per-sample voxel-cap, batched (vmapped) book builds stay as one
# program (compile-count parity for tiny configs); above it, per-sample
# builds dodge the ~2x batched-gather lowering penalty. IMMUTABLE constant.
BOOKS_PER_SAMPLE_MIN_VOXELS = 20_000


def build_branch_rulebooks(keys, grid: GridSpec, caps, with_transpose: bool = False,
                           lut_max_cells: int = None, with_conv_out: bool = True,
                           dense_tail: bool = False, return_luts: bool = False):
    """All 8 rulebooks of one encoder branch, computed OUTSIDE any remat
    boundary (they carry no gradients; recomputing their LUT scatters / joins
    in the backward replay would dominate the training step).

    ``with_transpose`` additionally builds the INVERSE rulebooks of the four
    strided convs (``*_T`` keys) so their backward runs as a gather-GEMM via
    the custom VJP (no scatter-adds) -- train-time only; submanifold convs
    get their transpose for free by mirroring tap columns.

    ``return_luts`` additionally returns the stage bitmap-rank LUTs of the
    RoI-pooling scales ({"x_conv3": ..., "x_conv4": ...}, entries only when
    built): the RoI head's voxel queries look up the SAME key sets, so
    rebuilding these tables there would duplicate the scatter+cumsum builds.

    At batch > 1 and realistic voxel counts the books are built PER SAMPLE
    (python-unrolled (1, V) slices, then concatenated): XLA's leading-batch
    gather lowering is ~2x slower than the same gathers issued per sample
    (sparse.PER_SAMPLE_GATHER_MIN_IDX), and the penalty afflicts the vmapped
    builders too -- measured 299.5 -> 189.5 ms for the batch-4 train books
    (scripts/exp_r4_books.py, v5e). Tiny configs (unit tests, the multichip
    dryrun) stay batched so their compiled op count is unchanged."""
    b, v_cap = keys.shape
    if (b > 1 and v_cap >= BOOKS_PER_SAMPLE_MIN_VOXELS
            and sparse.batch_unroll_allowed()):
        sparse._note_unroll()
        outs = [
            build_branch_rulebooks(keys[i:i + 1], grid, caps, with_transpose,
                                   lut_max_cells, with_conv_out, dense_tail,
                                   return_luts)
            for i in range(b)
        ]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
    g = stage_grids(grid)
    rbs = {}
    luts = {}
    max_cells = sparse.DENSE_LUT_MAX_CELLS if lut_max_cells is None else lut_max_cells

    def stage_lut(k, gg):
        # one bitmap-rank LUT per stage level, shared by every builder that
        # looks up that stage's keys; None (-> rank-join in the builders)
        # above the LUT threshold. Bitmap vs dense int32 LUT measured at
        # stage-0 scale: build 5.3 vs 20.1 ms, 13-tap packed lookups 10.3 vs
        # 14.8 ms, and 16x less HBM (23 MB vs 371 MB per sample).
        if gg.num_cells > max_cells:
            return None
        return sparse.build_bitmap_lut_batched(k, gg)

    lut0 = stage_lut(keys, g["x_conv1"])
    rbs["subm1"] = sparse.build_subm_rulebook_batched(keys, g["x_conv1"], lut=lut0)
    rbs["down2"], _ = sparse.build_conv_rulebook_batched(
        keys, g["x_conv1"], (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[0], lut=lut0)
    k1 = rbs["down2"].out_keys
    lut1 = stage_lut(k1, g["x_conv2"])
    rbs["subm2"] = sparse.build_subm_rulebook_batched(k1, g["x_conv2"], lut=lut1)
    rbs["down3"], _ = sparse.build_conv_rulebook_batched(
        k1, g["x_conv2"], (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[1], lut=lut1)
    k2 = rbs["down3"].out_keys
    lut2 = stage_lut(k2, g["x_conv3"])
    if lut2 is not None:
        luts["x_conv3"] = lut2
    rbs["subm3"] = sparse.build_subm_rulebook_batched(k2, g["x_conv3"], lut=lut2)
    if with_transpose:
        # transposes for the strided convs that exist on EVERY path (the
        # dense tail still trains down2/down3 through the sparse custom-VJP,
        # so their gather-only backward needs these)
        rbs["down2_T"] = sparse.build_inverse_rulebook_batched(
            keys, k1, g["x_conv1"], g["x_conv2"], (3, 3, 3), (2, 2, 2), (1, 1, 1),
            out_lut=lut1)
        rbs["down3_T"] = sparse.build_inverse_rulebook_batched(
            k1, k2, g["x_conv2"], g["x_conv3"], (3, 3, 3), (2, 2, 2), (1, 1, 1),
            out_lut=lut2)
    if dense_tail:
        # stage 4 + conv_out run as dense conv3d (ResBranch._dense_tail):
        # the stage-4 rulebooks (and their transposes) are never needed
        return (rbs, luts) if return_luts else rbs
    rbs["down4"], _ = sparse.build_conv_rulebook_batched(
        k2, g["x_conv3"], (3, 3, 3), (2, 2, 2), (1, 1, 0), caps[2], lut=lut2)
    k3 = rbs["down4"].out_keys
    lut3 = stage_lut(k3, g["x_conv4"])
    if lut3 is not None:
        luts["x_conv4"] = lut3
    rbs["subm4"] = sparse.build_subm_rulebook_batched(k3, g["x_conv4"], lut=lut3)
    if with_conv_out:
        rbs["conv_out"], _ = sparse.build_conv_rulebook_batched(
            k3, g["x_conv4"], (1, 1, 3), (1, 1, 2), (0, 0, 0), caps[3], lut=lut3)
    if with_transpose:
        rbs["down4_T"] = sparse.build_inverse_rulebook_batched(
            k2, k3, g["x_conv3"], g["x_conv4"], (3, 3, 3), (2, 2, 2), (1, 1, 0),
            out_lut=lut3)
        if with_conv_out:
            rbs["conv_out_T"] = sparse.build_inverse_rulebook_batched(
                k3, rbs["conv_out"].out_keys, g["x_conv4"], g["encoded"],
                (1, 1, 3), (1, 1, 2), (0, 0, 0))
    return (rbs, luts) if return_luts else rbs


def stage_grids(grid: GridSpec):
    """Static GridSpec per backbone output key (the 8x conv ladder)."""
    g0 = grid
    g1 = g0.downsample((2, 2, 2), (1, 1, 1), (3, 3, 3))
    g2 = g1.downsample((2, 2, 2), (1, 1, 1), (3, 3, 3))
    g3 = g2.downsample((2, 2, 2), (1, 1, 0), (3, 3, 3))
    g_out = g3.downsample((1, 1, 2), (0, 0, 0), (1, 1, 3))
    return {"x_conv1": g0, "x_conv2": g1, "x_conv3": g2, "x_conv4": g3,
            "encoded": g_out}


def _conv_init(key, shape, dtype=jnp.float32):
    # kaiming-uniform-flavored init; fan_in = K * Cin
    import jax

    k, cin, cout = shape
    fan_in = k * cin
    bound = (6.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SubMConvBN(nn.Module):
    """Submanifold conv + masked BN + optional ReLU, on a prebuilt rulebook."""

    out_channels: int
    kernel_volume: int = 27
    relu: bool = True
    bn_axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16
    kernel_dims: Tuple[int, int, int] = (3, 3, 3)  # (x, y, z), dense path only

    @nn.compact
    def __call__(self, features, rulebook, train: bool):
        cin = features.shape[-1]
        w = self.param("kernel", _conv_init, (self.kernel_volume, cin, self.out_channels))
        if isinstance(rulebook, DenseCtx):
            # dense-tail path: unoccupied cells are zero on input, the masked
            # BN re-zeroes them on output, so the dense conv sum equals the
            # submanifold gather-conv at every occupied site
            out = _dense_conv(features, w, self.kernel_dims, rulebook,
                              self.compute_dtype)
            out = MaskedBatchNorm(axis_name=self.bn_axis_name)(
                out, rulebook.mask, train)
            return nn.relu(out) if self.relu else out
        # bf16 activations: the tall-skinny conv GEMM is ~2x faster with a
        # bf16 result and the activation chain halves its HBM footprint; BN
        # still computes its statistics in f32
        out = sparse.sparse_conv_apply_batched(features, rulebook, w,
                                               compute_dtype=self.compute_dtype,
                                               transpose="mirror",
                                               out_dtype=self.compute_dtype or jnp.float32,
                                               # 27-volume kernels here are 3x3x3
                                               # (dx-fastest runs of 3)
                                               win_run=3 if self.kernel_volume == 27 else 1)
        out = MaskedBatchNorm(axis_name=self.bn_axis_name)(out, rulebook.out_valid, train)
        if self.relu:
            out = nn.relu(out)
        return out


class StridedConvBN(nn.Module):
    """Strided sparse conv + masked BN + ReLU; rulebook passed in."""

    out_channels: int
    kernel_volume: int
    bn_axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16
    kernel_dims: Tuple[int, int, int] = (3, 3, 3)  # (x, y, z), dense path only

    @nn.compact
    def __call__(self, features, rulebook, train: bool, transpose=None):
        cin = features.shape[-1]
        w = self.param("kernel", _conv_init, (self.kernel_volume, cin, self.out_channels))
        if isinstance(rulebook, DenseCtx):
            out = _dense_conv(features, w, self.kernel_dims, rulebook,
                              self.compute_dtype)
            out = MaskedBatchNorm(axis_name=self.bn_axis_name)(
                out, rulebook.mask, train)
            return nn.relu(out)
        out = sparse.sparse_conv_apply_batched(features, rulebook, w,
                                               compute_dtype=self.compute_dtype,
                                               transpose=transpose,
                                               out_dtype=self.compute_dtype or jnp.float32,
                                               win_run=3 if self.kernel_volume == 27 else 1)
        out = MaskedBatchNorm(axis_name=self.bn_axis_name)(out, rulebook.out_valid, train)
        return nn.relu(out)


class SparseBasicBlock(nn.Module):
    """Residual block of two submanifold convs (spconv_backbone.py:100-136)."""

    channels: int
    bn_axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, features, rulebook: Rulebook, train: bool):
        identity = features
        out = SubMConvBN(self.channels, relu=True, bn_axis_name=self.bn_axis_name,
                         compute_dtype=self.compute_dtype)(
            features, rulebook, train
        )
        out = SubMConvBN(self.channels, relu=False, bn_axis_name=self.bn_axis_name,
                         compute_dtype=self.compute_dtype)(
            out, rulebook, train
        )
        return nn.relu(out + identity)


class ResBranch(nn.Module):
    """One full encoder branch of VoxelResBackBone8x.

    Stage layout (channels 16/32/64/128, strides 1/2/2/2 + conv_out z-stride):
      conv_input: subm 3x3x3 -> C0
      conv1: 2 x SparseBasicBlock(C0)
      conv2: strided 3x3x3 s2 p1 -> C1, then 2 x block
      conv3: strided -> C2, 2 x block
      conv4: strided p(x1,y1,z0) -> C3, 2 x block
      conv_out: kernel (x1,y1,z3), stride (1,1,2), pad 0 -> C3
    """

    grid: GridSpec
    num_filters: Tuple[int, ...] = (16, 32, 64, 128)
    caps: Tuple[int, ...] = (80000, 60000, 40000, 40000)  # out caps of conv2..conv_out
    bn_axis_name: Optional[str] = None
    # the reference MM branch is SHALLOWER than the main one: conv2_2/3_2/4_2
    # carry ONE SparseBasicBlock each (vs two) and there is no conv_out_2
    # (spconv_backbone.py:459-487, forward :581 keeps conv_out commented out)
    light: bool = False
    # run stage 4 + conv_out as DENSE conv3d on the 8x-downsampled grid: at
    # that resolution the MXU beats the HBM-transaction-bound sparse
    # gather-GEMM path, and the subm4/down4/conv_out rulebooks are never
    # built. Numerically equal to the sparse path (masked-BN re-zeroing keeps
    # unoccupied cells at exactly 0 between convs); parameter tree identical.
    dense_tail: bool = False
    # activation/GEMM dtype for every conv in the branch (f32 for parity
    # debugging; bf16 default -- the measured ~2x tall-skinny GEMM win)
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, features, rulebooks, train: bool):
        c0, c1, c2, c3 = self.num_filters
        rb0 = rulebooks["subm1"]
        x = SubMConvBN(c0, name="conv_input", compute_dtype=self.compute_dtype)(features, rb0, train)
        x = SparseBasicBlock(c0, name="res1a", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(x, rb0, train)
        x = SparseBasicBlock(c0, name="res1b", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(x, rb0, train)
        # arrays only: GridSpecs are attached statically by the backbone wrapper
        # (a remat boundary would otherwise turn their ints into tracers)
        out = {"x_conv1": (x, rb0.out_keys)}

        x = StridedConvBN(c1, 27, name="down2", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(
            x, rulebooks["down2"], train, rulebooks.get("down2_T"))
        rb1 = rulebooks["subm2"]
        x = SparseBasicBlock(c1, name="res2a", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(x, rb1, train)
        if not self.light:
            x = SparseBasicBlock(c1, name="res2b", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(x, rb1, train)
        out["x_conv2"] = (x, rb1.out_keys)

        x = StridedConvBN(c2, 27, name="down3", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(
            x, rulebooks["down3"], train, rulebooks.get("down3_T"))
        rb2 = rulebooks["subm3"]
        x = SparseBasicBlock(c2, name="res3a", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(x, rb2, train)
        if not self.light:
            x = SparseBasicBlock(c2, name="res3b", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(x, rb2, train)
        out["x_conv3"] = (x, rb2.out_keys)

        if self.dense_tail:
            return self._dense_tail(x, rb2.out_keys, out, train)

        x = StridedConvBN(c3, 27, name="down4", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(
            x, rulebooks["down4"], train, rulebooks.get("down4_T"))
        rb3 = rulebooks["subm4"]
        x = SparseBasicBlock(c3, name="res4a", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(x, rb3, train)
        if not self.light:
            x = SparseBasicBlock(c3, name="res4b", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(x, rb3, train)
        out["x_conv4"] = (x, rb3.out_keys)

        if not self.light:
            x = StridedConvBN(c3, 3, name="conv_out", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(
                x, rulebooks["conv_out"], train, rulebooks.get("conv_out_T"))
            out["encoded"] = (x, rulebooks["conv_out"].out_keys)
        return out

    def _dense_tail(self, x, keys3, out, train: bool):
        """Stage 4 + conv_out on the dense (nz3, ny3, nx3) grid.

        Measured on v5e (scripts/exp_r2o_dense_tail.py): the full dense
        x_conv4 stage runs at ~10 ms vs the sparse path's gathers+rulebooks,
        and conv_out's output feeds the BEV map directly (no sparse
        extraction + re-scatter round trip). x_conv4 rows are gathered back
        out of the dense grid for the RoI head (keys via rank compaction of
        the occupancy mask: same sorted key set the capped rulebook emits).

        Cap-overflow note: the dense convs/BN/BEV cover ALL occupied sites,
        while the sparse path truncates at caps[2]/caps[3] -- above the cap
        the extracted keys4/rows4 drop the key-order tail but the BEV map
        keeps it. Strictly MORE information than the sparse path (which
        drops those sites everywhere); equality with the sparse path holds
        below the caps, which the shipped caps are sized for.
        """
        c2, c3 = self.num_filters[2], self.num_filters[3]
        g = stage_grids(self.grid)
        g2, g3, g_out = g["x_conv3"], g["x_conv4"], g["encoded"]
        b = x.shape[0]
        dense3 = jax.vmap(lambda f, k: sparse.to_dense(f, k, g2, c2))(x, keys3)
        mask3 = jax.vmap(lambda k: sparse.dense_mask_from_keys(k, g2))(keys3)

        mask4 = _downsample_mask(mask3, (3, 3, 3), (2, 2, 2), (1, 1, 0))
        ctx_down = DenseCtx(mask4, (2, 2, 2), ((0, 0), (1, 1), (1, 1)))
        x4 = StridedConvBN(c3, 27, name="down4", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(
            dense3, ctx_down, train)
        ctx4 = DenseCtx(mask4, (1, 1, 1), ((1, 1), (1, 1), (1, 1)))
        x4 = SparseBasicBlock(c3, name="res4a", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(
            x4, ctx4, train)
        if not self.light:
            x4 = SparseBasicBlock(c3, name="res4b", bn_axis_name=self.bn_axis_name, compute_dtype=self.compute_dtype)(
                x4, ctx4, train)

        keys4, _ = jax.vmap(
            lambda m: sparse.keys_from_dense_mask(m.reshape(-1), self.caps[2]))(mask4)
        rows4 = jax.vmap(sparse.rows_from_dense)(x4.reshape(b, -1, c3), keys4)
        out["x_conv4"] = (rows4, keys4)

        if not self.light:
            mask_out = _downsample_mask(mask4, (1, 1, 3), (1, 1, 2), (0, 0, 0))
            ctx_out = DenseCtx(mask_out, (2, 1, 1), ((0, 0), (0, 0), (0, 0)))
            xo = StridedConvBN(c3, 3, name="conv_out", kernel_dims=(1, 1, 3),
                               bn_axis_name=self.bn_axis_name,
                               compute_dtype=self.compute_dtype)(x4, ctx_out, train)
            keys_o, _ = jax.vmap(
                lambda m: sparse.keys_from_dense_mask(m.reshape(-1), self.caps[3]))(mask_out)
            rows_o = jax.vmap(sparse.rows_from_dense)(xo.reshape(b, -1, c3), keys_o)
            out["encoded"] = (rows_o, keys_o)
            # (B, nz, ny, nx, C) -> (B, ny, nx, nz*C): height_compression's
            # layout, computed without the sparse round trip
            bev = jnp.transpose(xo, (0, 2, 3, 1, 4)).reshape(
                b, g_out.ny, g_out.nx, g_out.nz * c3)
            out["encoded_bev"] = bev
        return out


class VoxelResBackBone8x(nn.Module):
    """CPD backbone with optional MM siamese branch (spconv_backbone.py:398-600).

    In training with ``mm=True``, a second, independently-parameterized branch
    encodes the proto-completed voxels (``voxel_features1``); its multi-scale
    outputs are exposed under ``*_mm`` keys for the proto RoI pooling path.
    """

    grid: GridSpec
    num_filters: Tuple[int, ...] = (16, 32, 64, 128)
    caps: Tuple[int, ...] = (80000, 60000, 40000, 40000)
    mm: bool = False
    bn_axis_name: Optional[str] = None
    # BACKBONE_3D.LUT_MAX_CELLS: grids above this use rank-joins instead of a
    # dense LUT (None = sparse.DENSE_LUT_MAX_CELLS default)
    lut_max_cells: Optional[int] = None
    # BACKBONE_3D.DENSE_TAIL: run stage 4 + conv_out as dense MXU conv3d
    # (see ResBranch._dense_tail); parameter tree unchanged
    dense_tail: bool = False
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    remat: bool = True  # rematerialize branch activations (trades recompute
    # for the backward-pass HBM that otherwise OOMs batch-4 training)

    @nn.compact
    def __call__(self, features, keys, train: bool, features_mm=None, keys_mm=None):
        branch_cls = nn.remat(ResBranch, static_argnums=(3,)) if (self.remat and train) else ResBranch
        branch = branch_cls(
            self.grid, self.num_filters, self.caps, self.bn_axis_name,
            dense_tail=self.dense_tail, compute_dtype=self.compute_dtype,
            name="branch0"
        )
        # rulebooks carry no gradients: build them OUTSIDE the remat boundary
        # so the backward replay recomputes only the conv GEMMs
        rbs, luts = build_branch_rulebooks(keys, self.grid, self.caps,
                                           with_transpose=train,
                                           lut_max_cells=self.lut_max_cells,
                                           dense_tail=self.dense_tail,
                                           return_luts=True)
        stage_luts = dict(luts)
        raw = branch(features, rbs, train)
        if self.mm and features_mm is not None:
            branch1 = branch_cls(
                self.grid, self.num_filters, self.caps, self.bn_axis_name,
                light=True, dense_tail=self.dense_tail,
                compute_dtype=self.compute_dtype, name="branch1"
            )
            # the light branch has no conv_out: skip that rulebook + transpose
            rbs_mm, luts_mm = build_branch_rulebooks(keys_mm, self.grid, self.caps,
                                                     with_transpose=train,
                                                     lut_max_cells=self.lut_max_cells,
                                                     with_conv_out=False,
                                                     dense_tail=self.dense_tail,
                                                     return_luts=True)
            stage_luts.update({k + "_mm": v for k, v in luts_mm.items()})
            out_mm = branch1(features_mm, rbs_mm, train)
            for k in ("x_conv1", "x_conv2", "x_conv3", "x_conv4"):
                raw[k + "_mm"] = out_mm[k]
        # reattach the static grids OUTSIDE the (possibly remat-ed) branches
        grids = stage_grids(self.grid)
        out = {}
        for k, v in raw.items():
            if k == "encoded_bev":  # bare BEV map from the dense tail
                out[k] = v
            else:
                f, ky = v
                out[k] = (f, ky, grids[k.replace("_mm", "")])
        if stage_luts:
            # the RoI head's voxel queries reuse these instead of rebuilding
            out["stage_luts"] = stage_luts
        return out


class PlainBranch(nn.Module):
    """Non-residual encoder branch (VoxelBackBone8x, spconv_backbone.py:138):
    same stage/stride layout but plain SubM conv stacks instead of residual
    blocks (16/32/64/64 filters in the reference default)."""

    grid: GridSpec
    num_filters: Tuple[int, ...] = (16, 32, 64, 64)
    caps: Tuple[int, ...] = (80000, 60000, 40000, 40000)
    bn_axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, features, keys, train: bool):
        c0, c1, c2, c3 = self.num_filters
        cd = self.compute_dtype
        g0 = self.grid
        rb0 = sparse.build_subm_rulebook_batched(keys, g0)
        x = SubMConvBN(c0, name="conv_input", compute_dtype=cd)(features, rb0, train)
        x = SubMConvBN(c0, name="conv1", compute_dtype=cd)(x, rb0, train)
        out = {"x_conv1": (x, keys, g0)}  # PlainBranch is not remat-wrapped
        cur_keys, cur_grid = keys, g0
        for i, (c, cap, pz) in enumerate(zip((c1, c2, c3), self.caps[:3], (1, 1, 0))):
            rb_d, g = sparse.build_conv_rulebook_batched(
                cur_keys, cur_grid, (3, 3, 3), (2, 2, 2), (1, 1, pz), cap)
            x = StridedConvBN(c, 27, name=f"down{i + 2}", compute_dtype=cd)(x, rb_d, train)
            cur_keys, cur_grid = rb_d.out_keys, g
            rb = sparse.build_subm_rulebook_batched(cur_keys, cur_grid)
            x = SubMConvBN(c, name=f"conv{i + 2}a", compute_dtype=cd)(x, rb, train)
            x = SubMConvBN(c, name=f"conv{i + 2}b", compute_dtype=cd)(x, rb, train)
            out[f"x_conv{i + 2}"] = (x, cur_keys, cur_grid)
        rb_out, g_out = sparse.build_conv_rulebook_batched(
            cur_keys, cur_grid, (1, 1, 3), (1, 1, 2), (0, 0, 0), self.caps[3])
        x = StridedConvBN(128, 3, name="conv_out", compute_dtype=cd)(x, rb_out, train)
        out["encoded"] = (x, rb_out.out_keys, g_out)
        return out


class VoxelBackBone8x(nn.Module):
    """Registry alternative: the plain (non-residual) 8x backbone."""

    grid: GridSpec
    num_filters: Tuple[int, ...] = (16, 32, 64, 64)
    caps: Tuple[int, ...] = (80000, 60000, 40000, 40000)
    mm: bool = False
    bn_axis_name: Optional[str] = None
    lut_max_cells: Optional[int] = None  # accepted for registry uniformity

    @nn.compact
    def __call__(self, features, keys, train: bool, features_mm=None, keys_mm=None):
        out = PlainBranch(self.grid, self.num_filters, self.caps,
                          self.bn_axis_name, name="branch0")(features, keys, train)
        if self.mm and features_mm is not None:
            out_mm = PlainBranch(self.grid, self.num_filters, self.caps,
                                 self.bn_axis_name, name="branch1")(features_mm, keys_mm, train)
            for k in list(out_mm):
                out[k + "_mm"] = out_mm[k]
        return out
