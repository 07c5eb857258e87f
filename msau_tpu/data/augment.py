"""Geometric augmentation for chargrid stacks — device-side warps.

Reference behavior (utils/image_util.py:22-90, applied to the concatenated
input/target stack in data_generator_text.py:303-344):

* random affine: 3-point correspondence jittered by alpha_affine px;
* elastic (Simard2003): coarse (H//25, W//25) random fields, gaussian
  smoothed, upsampled bicubic, scaled by elastic_value * min(H, W);
* after warping, channels are re-binarized and one-hot consistency is
  restored with a dominating channel.

Divergences from the reference (intended-behavior fixes, SURVEY.md §2.12):
* interpolation is bilinear (jax map_coordinates supports order<=1; the
  reference used order-3 splines) — immaterial for 0/1 masks;
* re-binarization threshold is 0.25 on the warped [0,1] values; the
  committed reference compares against 64, which zeroes 0/1 data.

Randomness is drawn host-side from a numpy Generator (deterministic per
worker); the warp itself runs on device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BINARIZE_THRESHOLD = 0.25


def random_affine_matrix(
    shape: Tuple[int, int], affine_value: float, rng: np.random.Generator
) -> np.ndarray:
    """3-point-correspondence affine, jitter ~ U(-a, a) with
    a = min(H, W) * affine_value (image_util.py:38-50).  Returns the 2x3
    output->input matrix."""
    h, w = shape
    alpha = min(h, w) * affine_value
    center = np.array([h // 2, w // 2], np.float32)
    sq = min(h, w) // 3
    pts1 = np.float32(
        [center + sq, [center[0] + sq, center[1] - sq], center - sq]
    )
    pts2 = pts1 + rng.uniform(-alpha, alpha, pts1.shape).astype(np.float32)
    # least squares for x' = A x + b
    a_rows, b_vals = [], []
    for src, dst in zip(pts1, pts2):
        a_rows.append([src[0], 0, src[1], 0, 1, 0])
        a_rows.append([0, src[0], 0, src[1], 0, 1])
        b_vals.extend(dst)
    sol, *_ = np.linalg.lstsq(np.asarray(a_rows), np.asarray(b_vals), rcond=None)
    a0, a1, a2, a3, a4, a5 = sol
    return np.float32([[a0, a2, a4], [a1, a3, a5]])


@functools.partial(jax.jit, static_argnames=())
def apply_affine(stack: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Warp [H, W, C] with a 2x3 output->input affine (order-1, cval 0)."""
    h, w, c = stack.shape
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    src_y = matrix[0, 0] * gy + matrix[0, 1] * gx + matrix[0, 2]
    src_x = matrix[1, 0] * gy + matrix[1, 1] * gx + matrix[1, 2]

    def warp_plane(p):
        return jax.scipy.ndimage.map_coordinates(
            p, [src_y, src_x], order=1, mode="constant", cval=0.0
        )

    return jax.vmap(warp_plane, in_axes=-1, out_axes=-1)(stack)


def elastic_fields(
    shape: Tuple[int, int],
    elastic_value_x: float,
    elastic_value_y: float,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side coarse random displacement fields (image_util.py:67-87)."""
    h, w = shape
    ny, nx = max(h // 25, 1), max(w // 25, 1)
    sigma = min(h, w) * 0.0025
    coarse_dx = rng.random((ny, nx)) * 2 - 1
    coarse_dy = rng.random((ny, nx)) * 2 - 1
    if sigma > 0:
        from scipy.ndimage import gaussian_filter

        coarse_dx = gaussian_filter(coarse_dx, sigma)
        coarse_dy = gaussian_filter(coarse_dy, sigma)
    return coarse_dx.astype(np.float32), coarse_dy.astype(np.float32)


@functools.partial(jax.jit, static_argnames=())
def apply_elastic(
    stack: jnp.ndarray,
    coarse_dx: jnp.ndarray,
    coarse_dy: jnp.ndarray,
    alpha_x: jnp.ndarray,
    alpha_y: jnp.ndarray,
) -> jnp.ndarray:
    """Upsample coarse fields (cubic) and warp [H, W, C] (order-1)."""
    h, w, c = stack.shape
    dx = jax.image.resize(coarse_dx, (h, w), method="cubic") * alpha_x
    dy = jax.image.resize(coarse_dy, (h, w), method="cubic") * alpha_y
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )

    def warp_plane(p):
        return jax.scipy.ndimage.map_coordinates(
            p, [gy + dy, gx + dx], order=1, mode="constant", cval=0.0
        )

    return jax.vmap(warp_plane, in_axes=-1, out_axes=-1)(stack)


@functools.partial(jax.jit, static_argnames=("dominating_channel",))
def rebinarize_one_hot(
    tgt: jnp.ndarray, dominating_channel: int = 1
) -> jnp.ndarray:
    """Restore exclusive one-hot after warping (data_generator_text.py:334-344):
    the dominating channel wins overlaps, channel 0 becomes the complement."""
    b = tgt > BINARIZE_THRESHOLD
    c = tgt.shape[-1]
    claimed = b[..., dominating_channel]
    planes = [None] * c
    planes[dominating_channel] = b[..., dominating_channel]
    for ch in range(1, c):
        if ch == dominating_channel:
            continue
        tmap = b[..., ch] & ~claimed
        claimed = claimed | tmap
        planes[ch] = tmap
    planes[0] = ~claimed
    return jnp.stack(planes, axis=-1).astype(tgt.dtype)


def augment_stack(
    stack: jnp.ndarray,
    rng: np.random.Generator,
    *,
    affine: bool = False,
    affine_value: float = 0.025,
    elastic: bool = False,
    elastic_value_x: float = 0.0002,
    elastic_value_y: float = 0.0002,
) -> jnp.ndarray:
    """Apply the configured warps to an [H, W, C] stack and binarize."""
    h, w = stack.shape[:2]
    out = stack
    if affine:
        m = random_affine_matrix((h, w), affine_value, rng)
        out = apply_affine(out, jnp.asarray(m))
    if elastic:
        cdx, cdy = elastic_fields((h, w), elastic_value_x, elastic_value_y, rng)
        ax = elastic_value_x * min(h, w)
        ay = elastic_value_y * min(h, w)
        out = apply_elastic(out, jnp.asarray(cdx), jnp.asarray(cdy),
                            jnp.float32(ax), jnp.float32(ay))
    if affine or elastic:
        out = (out > BINARIZE_THRESHOLD).astype(stack.dtype)
    return out
