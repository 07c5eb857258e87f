"""Learnable box convolution — TPU-native integral-image formulation.

Replaces the reference's external CUDA extension (shrubb/box-convolutions,
used via ``BoxConv2d`` in model/model_box.py:6,32): each (channel, box)
pair learns a rectangle (x_min, x_max, y_min, y_max) and outputs the
(area-normalized) average of the input over that rectangle translated to
every pixel.

Design (SURVEY.md §2.9): instead of custom CUDA kernels, the box sum is
computed from a 2-D inclusive prefix sum (XLA cumsum — log-depth on TPU)
sampled at the 4 box corners with bilinear interpolation.  Because

    d/dt bilinear(II, y + t) = II(y + floor(t) + 1) - II(y + floor(t)),

autodiff through the fractional blend weights yields exactly the analytic
boundary-integral gradients w.r.t. the box coordinates that the CUDA
implementation hand-codes — no custom VJP needed for correctness.

Out-of-bounds behavior matches zero padding: the integral image is padded
with zeros above/left and edge-replicated below/right, and sample
coordinates are clamped into that support.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def integral_image(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive 2-D prefix sum over (H, W): out[..., i, j, :] = sum of
    x[..., :i, :j, :].  Input [N, H, W, C] -> output [N, H+1, W+1, C]."""
    ii = jnp.cumsum(jnp.cumsum(x, axis=1), axis=2)
    ii = jnp.pad(ii, ((0, 0), (1, 0), (1, 0), (0, 0)))
    return ii


def _sample_ii_plane(ii: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray, h: int, w: int, pad: int) -> jnp.ndarray:
    """Bilinearly sample a padded integral plane [N, Hp, Wp] at
    (i + dy, j + dx) for the (h, w) output grid anchored at ``pad``."""
    dy = jnp.clip(dy, -pad, pad - 1)
    dx = jnp.clip(dx, -pad, pad - 1)
    y0 = jnp.floor(dy)
    x0 = jnp.floor(dx)
    fy = dy - y0
    fx = dx - x0
    iy = y0.astype(jnp.int32) + pad
    ix = x0.astype(jnp.int32) + pad

    def shift(oy, ox):
        return jax.lax.dynamic_slice(
            ii, (0, iy + oy, ix + ox), (ii.shape[0], h, w)
        )

    s00 = shift(0, 0)
    s01 = shift(0, 1)
    s10 = shift(1, 0)
    s11 = shift(1, 1)
    return (
        s00 * (1 - fy) * (1 - fx)
        + s01 * (1 - fy) * fx
        + s10 * fy * (1 - fx)
        + s11 * fy * fx
    )


@functools.partial(jax.jit, static_argnames=("max_h", "max_w", "normalize"))
def box_conv2d(
    x: jnp.ndarray,        # [N, H, W, C]
    y_min: jnp.ndarray,    # [C, B] float box coords (pixels, signed)
    y_max: jnp.ndarray,
    x_min: jnp.ndarray,
    x_max: jnp.ndarray,
    *,
    max_h: int,
    max_w: int,
    normalize: bool = True,
) -> jnp.ndarray:
    """Box-filter responses -> [N, H, W, C*B] (box-major per channel:
    output channel index = c * B + b, matching the torch extension's
    (C, B) unfolding)."""
    n, h, w, c = x.shape
    b = y_min.shape[1]
    # clamp + order the learnable coords (projection step of the reference
    # extension folded into the forward pass)
    y1 = jnp.clip(jnp.minimum(y_min, y_max), -max_h, max_h)
    y2 = jnp.clip(jnp.maximum(y_min, y_max), -max_h, max_h)
    x1 = jnp.clip(jnp.minimum(x_min, x_max), -max_w, max_w)
    x2 = jnp.clip(jnp.maximum(x_min, x_max), -max_w, max_w)

    ii = integral_image(x)                      # [N, H+1, W+1, C]
    pad = max(max_h, max_w) + 2
    # zeros above/left are already in ii (exclusive prefix); replicate edge
    # below/right so samples past the image see the full sum
    ii_p = jnp.pad(ii, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    # zero out the top/left pad (edge mode copied zeros there anyway, since
    # ii[:, 0, :, :] == 0 == ii[:, :, 0, :])
    planes = jnp.moveaxis(ii_p, -1, 0)          # [C, N, Hp, Wp]

    def per_channel(plane, yy1, yy2, xx1, xx2):
        def per_box(a1, a2, b1, b2):
            # box sum over rows [i+a1, i+a2] x cols [j+b1, j+b2] inclusive
            s = (
                _sample_ii_plane(plane, a2 + 1.0, b2 + 1.0, h, w, pad)
                - _sample_ii_plane(plane, a1, b2 + 1.0, h, w, pad)
                - _sample_ii_plane(plane, a2 + 1.0, b1, h, w, pad)
                + _sample_ii_plane(plane, a1, b1, h, w, pad)
            )
            if normalize:
                area = (a2 - a1 + 1.0) * (b2 - b1 + 1.0)
                s = s / jnp.maximum(area, 1.0)
            return s

        return jax.vmap(per_box)(yy1, yy2, xx1, xx2)   # [B, N, H, W]

    out = jax.vmap(per_channel)(planes, y1, y2, x1, x2)  # [C, B, N, H, W]
    out = jnp.transpose(out, (2, 3, 4, 0, 1)).reshape(n, h, w, c * b)
    return out


class BoxConv2d(nn.Module):
    """flax module with learnable per-(channel, box) rectangles."""

    channels: int
    num_boxes: int
    max_h: int
    max_w: int
    normalize: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c, b = self.channels, self.num_boxes

        def init_minmax(max_dim):
            def init(key, shape, dtype=jnp.float32):
                k1, k2 = jax.random.split(key)
                center = jax.random.uniform(
                    k1, shape, dtype, -max_dim / 4.0, max_dim / 4.0
                )
                half = jax.random.uniform(k2, shape, dtype, 1.0, max_dim / 2.0)
                return jnp.stack([center - half, center + half])

            return init

        ybox = self.param("ybox", init_minmax(self.max_h), (c, b))
        xbox = self.param("xbox", init_minmax(self.max_w), (c, b))
        return box_conv2d(
            x,
            ybox[0],
            ybox[1],
            xbox[0],
            xbox[1],
            max_h=self.max_h,
            max_w=self.max_w,
            normalize=self.normalize,
        )
