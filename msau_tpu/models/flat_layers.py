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
                     n_class: int = 17) -> List[FlatGeom]:
    """Geometries for scales 0..n_scales-1 (SAME-pool halving each scale).

    max_cin per scale: the widest flat conv is the up-tower merge
    (2 * feat_root * pool**scale channels); scale 0 also sees the
    n_class-channel entry conv of the coupled stages.
    """
    geoms = []
    for s in range(n_scales):
        cin = 2 * feat_root * pool ** s
        if s == 0:
            cin = max(cin, n_class)
        # deeper scales feed the x2 upsample kernel, whose half-tile input
        # windows need Wp_in % 8 == 0 for 128-aligned offsets; fall back
        # to the unconstrained geometry when that costs feasibility
        geom = None
        if s > 0:
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
    return geoms


def nhwc_to_body(x: jnp.ndarray, geom: FlatGeom) -> jnp.ndarray:
    from msau_tpu.ops.flatconv import to_body

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
