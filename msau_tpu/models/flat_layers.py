"""Body-flat (channel-major) counterparts of the layer library.

These modules compute on the flat W-on-lanes layout of
``msau_tpu.ops.flatconv`` while creating parameters with exactly the same
names, shapes and initializers as their NHWC counterparts in
``msau_tpu.models.layers`` — so a checkpoint trained either way loads into
both, and the layout is a pure runtime choice (``ModelConfig.flat_scales``).

Used for the shallow U-Net scales where feat_root-sized channel counts
(8/16) waste 16x HBM traffic in XLA's NHWC lane layout (see
ops/flatconv.py and PERF.md).  Reference layer semantics:
model/layers/layers.py:10-164,207-260.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from msau_tpu.ops.flatconv import (
    VMEM_XS_BUDGET,
    FlatGeom,
    choose_geom,
    flat_conv2d,
)

Dtype = object


def make_scale_geoms(h: int, w: int, n_scales: int, itemsize: int = 2,
                     pool: int = 2, feat_root: int = 8,
                     n_class: int = 17,
                     align_scales: int = 1) -> List[FlatGeom]:
    """Geometries for scales 0..n_scales-1 (SAME-pool halving each scale).

    max_cin per scale: the widest flat conv is the up-tower merge
    (2 * feat_root * pool**scale channels); scale 0 also sees the
    n_class-channel entry conv of the coupled stages.

    Scales < ``align_scales`` prefer a lane-ALIGNED geometry
    (Wp % 128 == 0, ops/flatconv.py aligned-tap scheme).  Default 1:
    measured on-chip (device trace, flagship bs=16 512^2 bf16 step),
    aligning scale 0 is 149.2 -> 143.1 ms/step while aligning deeper
    scales loses it back (148.1 at all-aligned) — their pad-column
    traffic inflation (Wp 260->384 at scale 1, 132->256 at scale 2)
    outweighs the VPU alignment win on their smaller tensors.
    """
    geoms = []
    for s in range(n_scales):
        cin = 2 * feat_root * pool ** s
        if s == 0:
            cin = max(cin, n_class)
        geom = None
        if s < align_scales:
            try:
                geom = choose_geom(h, w, itemsize=itemsize, max_cin=cin,
                                   wp_mod=128)
            except ValueError:
                geom = None
        # deeper scales feed the x2 upsample kernel, whose half-tile input
        # windows need Wp_in % 8 == 0 for 128-aligned offsets; fall back
        # to the unconstrained geometry when that costs feasibility
        if geom is None and s > 0:
            try:
                geom = choose_geom(h, w, itemsize=itemsize, max_cin=cin,
                                   wp_mod=8)
            except ValueError:
                geom = None
        if geom is None:
            geom = choose_geom(h, w, itemsize=itemsize, max_cin=cin)
        geoms.append(geom)
        h = -(-h // pool)
        w = -(-w // pool)
    # adjacent scales feed the Pallas x2 upsample; if an ALIGNED choice
    # breaks the pair's tile feasibility (small grids: e.g. Wp_in=40 has
    # no half-tile multiple of 128), demote it to the classic geometry —
    # the flagship 512/256 pair (Wp 640/264) is feasible and keeps it
    from msau_tpu.ops.flatconv import _upsample_tiles

    for s in range(len(geoms) - 1):
        if geoms[s].Wp % 128 == 0 and s < align_scales:
            if _upsample_tiles(geoms[s + 1], geoms[s]) is None:
                try:
                    cin = 2 * feat_root * pool ** s
                    if s == 0:
                        cin = max(cin, n_class)
                    geoms[s] = choose_geom(
                        geoms[s].H, geoms[s].W, itemsize=itemsize,
                        max_cin=cin, wp_mod=8 if s > 0 else 1)
                except ValueError:
                    pass
    return geoms


def split_spatial(x: jnp.ndarray, sp: int) -> jnp.ndarray:
    """Global NHWC [N, H, ...] -> shard-major [sp*N, H/sp, ...].

    Entry i*N + j holds rows [i*H/sp, (i+1)*H/sp) of image j — the batch
    representation the spatially sharded flat scales use (FlatGeom.sp).
    Under a GSPMD mesh the H axis sharded over 'spatial' becomes the
    shard-major factor of the merged batch axis (P(('spatial','data'))).
    """
    n, h = x.shape[0], x.shape[1]
    assert h % sp == 0, (x.shape, sp)
    xs = x.reshape((n, sp, h // sp) + x.shape[2:])
    xs = jnp.moveaxis(xs, 1, 0)
    return xs.reshape((sp * n, h // sp) + x.shape[2:])


def merge_spatial(x: jnp.ndarray, sp: int) -> jnp.ndarray:
    """Inverse of split_spatial: [sp*N, Hs, ...] -> [N, sp*Hs, ...]."""
    ne, hs = x.shape[0], x.shape[1]
    assert ne % sp == 0, (x.shape, sp)
    xs = x.reshape((sp, ne // sp, hs) + x.shape[2:])
    xs = jnp.moveaxis(xs, 0, 1)
    return xs.reshape((ne // sp, sp * hs) + x.shape[2:])


def nhwc_to_body(x: jnp.ndarray, geom: FlatGeom) -> jnp.ndarray:
    from msau_tpu.ops.flatconv import to_body, to_body_nhwc_fused

    # one-pass Pallas conversion when the shape admits it (the XLA chain
    # is transpose + pad + relayout + guard pad, ~4 full HBM passes)
    y = to_body_nhwc_fused(x, geom)
    if y is not None:
        return y
    return to_body(jnp.transpose(x, (0, 3, 1, 2)), geom)


def body_to_nhwc(x_body: jnp.ndarray, geom: FlatGeom) -> jnp.ndarray:
    from msau_tpu.ops.flatconv import from_body

    return jnp.transpose(from_body(x_body, geom), (0, 2, 3, 1))


def flat_eligible(cin: int, kh: int, kw: int, geom: FlatGeom,
                  itemsize: int, budget: int = VMEM_XS_BUDGET) -> bool:
    """Can the flat path serve this conv (directly or via cin chunking)?

    ``flat_conv2d`` splits convs wider than ``max_flat_cin`` into partial
    convs over cin chunks summed in the output, so eligibility only
    requires a single-channel tap stack to fit the shared VMEM budget —
    the wide 64-channel chargrid entry conv now runs flat instead of
    falling back to lane-padded NHWC.
    """
    from msau_tpu.ops.flatconv import max_flat_cin

    del cin  # any width is chunkable once one channel fits
    return max_flat_cin(kh, kw, geom, itemsize, budget) >= 1


class FlatConvOp(nn.Module):
    """Parameter-compatible stand-in for ``nn.Conv`` on body tensors.

    Instantiate with ``name='Conv_0'`` inside ConvBnLrnDrop-style modules so
    the param tree matches the NHWC branch exactly.  ``act``/``lrn_size``
    ride the conv kernel's fused epilogue (ops/flatconv.py) — the separate
    XLA activation/LRN passes over the full body tensor disappear.
    """

    features: int
    kernel_size: Tuple[int, int]
    dilation: int = 1
    act: Optional[str] = None
    lrn_size: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_body: jnp.ndarray, geom: FlatGeom) -> jnp.ndarray:
        from msau_tpu.models.layers import tf_bias_init, tf_conv_kernel_init

        cin = x_body.shape[1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            tf_conv_kernel_init(kh, kw, cin, self.features),
            (kh, kw, cin, self.features),
        )
        bias = self.param("bias", tf_bias_init(), (self.features,))
        dtype = self.dtype or x_body.dtype
        return flat_conv2d(
            x_body.astype(dtype), kernel, bias, geom, dilation=self.dilation,
            mask_cotangent=False,  # model pipeline preserves the invariant
            act=self.act, lrn_size=self.lrn_size,
        )


class _ConcatConvInner(nn.Module):
    features: int
    act: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a, b, geom):
        from msau_tpu.models.layers import tf_bias_init, tf_conv_kernel_init
        from msau_tpu.ops.flatconv import flat_concat_conv1x1

        cin = a.shape[1] + b.shape[1]
        kernel = self.param(
            "kernel", tf_conv_kernel_init(1, 1, cin, self.features),
            (1, 1, cin, self.features))
        bias = self.param("bias", tf_bias_init(), (self.features,))
        dtype = self.dtype or a.dtype
        return flat_concat_conv1x1(
            a.astype(dtype), b.astype(dtype), kernel, bias, geom,
            act=self.act)


class _ConcatConvKxKInner(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a, b, geom):
        from msau_tpu.models.layers import tf_bias_init, tf_conv_kernel_init
        from msau_tpu.ops.flatconv import flat_concat_conv2d

        cin = a.shape[1] + b.shape[1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", tf_conv_kernel_init(kh, kw, cin, self.features),
            (kh, kw, cin, self.features))
        bias = self.param("bias", tf_bias_init(), (self.features,))
        dtype = self.dtype or a.dtype
        return flat_concat_conv2d(
            a.astype(dtype), b.astype(dtype), kernel, bias, geom,
            mask_cotangent=False)  # model pipeline preserves the invariant


class ConcatConvKxK(nn.Module):
    """Fused concat + KxK conv (no activation) for the up-tower merge.

    Computes conv_KxK(concat([skip, deconv_out], channels)) in one Pallas
    kernel (flatconv.flat_concat_conv2d) — the 2C concat is never
    materialized, and the backward emits the two branch cotangents
    directly.  Param tree ("Conv_0/{kernel, bias}") matches the unfused
    ConvBnLrnDrop.  Reference semantics: model/model.py:228-243.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a, b, geom):
        return _ConcatConvKxKInner(
            features=self.features, kernel_size=self.kernel_size,
            dtype=self.dtype, name="Conv_0")(a, b, geom)


class ConcatConv1x1(nn.Module):
    """Fused concat + 1x1 ConvBnLrnDrop for the coupling layers.

    Computes act(conv1x1(concat([a, b], channels))) in ONE Pallas kernel
    (flatconv.flat_concat_conv1x1) — the 2C concat is never materialized.
    The param tree ("Conv_0/{kernel, bias}") matches the unfused
    ConvBnLrnDrop so checkpoints and the torch transplant are unaffected.
    Reference semantics: model/model.py:143-148, 246-252.
    """

    features: int
    act: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, a, b, geom):
        return _ConcatConvInner(
            features=self.features, act=self.act, dtype=self.dtype,
            name="Conv_0")(a, b, geom)
