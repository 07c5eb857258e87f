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


@functools.partial(jax.jit, static_argnames=("order", "out_shape"))
def apply_affine(
    stack: jnp.ndarray,
    matrix: jnp.ndarray,
    order: int = 1,
    out_shape: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Warp [H, W, C] with a 2x3 output->input affine (cval 0).

    ``order=0`` (nearest) preserves id-valued planes; ``order=1`` for
    one-hot/soft planes.  ``out_shape`` renders onto a different canvas
    (used by rotation, whose bounding box grows).
    """
    oh, ow = out_shape or stack.shape[:2]
    yy = jnp.arange(oh, dtype=jnp.float32)
    xx = jnp.arange(ow, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
    src_y = matrix[0, 0] * gy + matrix[0, 1] * gx + matrix[0, 2]
    src_x = matrix[1, 0] * gy + matrix[1, 1] * gx + matrix[1, 2]

    def warp_plane(p):
        return jax.scipy.ndimage.map_coordinates(
            p, [src_y, src_x], order=order, mode="constant", cval=0.0
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


@functools.partial(jax.jit, static_argnames=("order",))
def apply_elastic(
    stack: jnp.ndarray,
    coarse_dx: jnp.ndarray,
    coarse_dy: jnp.ndarray,
    alpha_x: jnp.ndarray,
    alpha_y: jnp.ndarray,
    order: int = 1,
) -> jnp.ndarray:
    """Upsample coarse fields (cubic) and warp [H, W, C]."""
    h, w, c = stack.shape
    dx = jax.image.resize(coarse_dx, (h, w), method="cubic") * alpha_x
    dy = jax.image.resize(coarse_dy, (h, w), method="cubic") * alpha_y
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )

    def warp_plane(p):
        return jax.scipy.ndimage.map_coordinates(
            p, [gy + dy, gx + dx], order=order, mode="constant", cval=0.0
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


def rotated_canvas(h: int, w: int, angle_deg: float) -> Tuple[int, int]:
    """Bounding-box size of an h x w page rotated by angle (like
    scipy ndimage.rotate with reshape=True, data_generator_text.py:332)."""
    th = np.deg2rad(angle_deg)
    c, s = abs(np.cos(th)), abs(np.sin(th))
    eps = 1e-6  # right angles hit exact integers up to fp error
    return int(np.ceil(h * c + w * s - eps)), int(np.ceil(w * c + h * s - eps))


def rotation_matrix(
    page_hw: Tuple[int, int], rot_hw: Tuple[int, int], angle_deg: float
) -> np.ndarray:
    """2x3 output->input affine rotating the page region about its center,
    re-centered on the rotated bounding box (top-left origin)."""
    th = np.deg2rad(angle_deg)
    c, s = np.cos(th), np.sin(th)
    cy_in, cx_in = (page_hw[0] - 1) / 2.0, (page_hw[1] - 1) / 2.0
    cy_out, cx_out = (rot_hw[0] - 1) / 2.0, (rot_hw[1] - 1) / 2.0
    # output coords -> input coords; positive angle rotates the image
    # counterclockwise in array space (scipy.ndimage.rotate convention,
    # +90 == np.rot90)
    return np.float32(
        [[c, s, cy_in - c * cy_out - s * cx_out],
         [-s, c, cx_in + s * cy_out - c * cx_out]]
    )


def sample_rotation(
    rng: np.random.Generator, *, rotate: bool, rotate_mod90: bool
) -> Tuple[Optional[float], int]:
    """(angle_deg or None, rot90_k).  Reference: rotate draws U(-20, 20)
    degrees (data_generator_text.py:308); rotateMod90 constrains rotation
    to right angles (the committed snapping at :310-318 is bitrot that
    always yields -45 — the intended mod-90 semantics are implemented
    here as an exact k*90 rot)."""
    if rotate_mod90:
        return None, int(rng.integers(0, 4))
    if rotate:
        return float(rng.uniform(-20.0, 20.0)), 0
    return None, 0


def augment_example(
    inp: jnp.ndarray,
    label: jnp.ndarray,
    valid: jnp.ndarray,
    n_classes: int,
    rng: np.random.Generator,
    *,
    affine: bool = False,
    affine_value: float = 0.025,
    elastic: bool = False,
    elastic_value_x: float = 0.0002,
    elastic_value_y: float = 0.0002,
    rotate_angle: Optional[float] = None,
    rot90_k: int = 0,
    page_hw: Optional[Tuple[int, int]] = None,
    out_hw: Optional[Tuple[int, int]] = None,
    n_id_planes: int = 2,
):
    """Jointly augment a rasterized training example.

    Mirrors the reference's whole-stack warp of concatenated
    input/target/aux maps followed by re-binarization and dominating-channel
    one-hot cleanup (data_generator_text.py:303-344).  The last
    ``n_id_planes`` input channels carry raw ids (line mask / char-sep) and
    are warped with nearest-neighbor so ids survive; one-hot planes are
    warped bilinearly and re-binarized; the integer label is warped as
    one-hot with the dominating-channel rule; ``valid`` tracks the page
    region through every transform.

    Args:
      inp:   [H, W, C] float32, last ``n_id_planes`` channels id-valued.
      label: [H, W] int32 class ids (0 = background/ignore).
      valid: [H, W] bool.
      rotate_angle: degrees, or None.  When set, ``page_hw`` (true content
        size) and ``out_hw`` (canvas, >= rotated bbox) must be given.
      rot90_k: exact multiple-of-90 rotation applied last (lossless).
    Returns:
      (inp, label, valid) tuple with the same dtypes; spatial dims change
      only via ``out_hw``/``rot90_k``.
    """
    c = inp.shape[-1]
    n_soft = c - n_id_planes
    soft = jnp.concatenate(
        [
            inp[..., :n_soft],
            jax.nn.one_hot(label, n_classes, dtype=jnp.float32),
            valid[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )
    hard = inp[..., n_soft:]

    h, w = soft.shape[:2]
    if affine:
        m = jnp.asarray(random_affine_matrix((h, w), affine_value, rng))
        soft = apply_affine(soft, m, order=1)
        hard = apply_affine(hard, m, order=0)
    if elastic:
        cdx, cdy = elastic_fields((h, w), elastic_value_x, elastic_value_y, rng)
        ax = jnp.float32(elastic_value_x * min(h, w))
        ay = jnp.float32(elastic_value_y * min(h, w))
        cdx, cdy = jnp.asarray(cdx), jnp.asarray(cdy)
        soft = apply_elastic(soft, cdx, cdy, ax, ay, order=1)
        hard = apply_elastic(hard, cdx, cdy, ax, ay, order=0)
    if rotate_angle is not None:
        assert page_hw is not None and out_hw is not None
        rot_hw = rotated_canvas(page_hw[0], page_hw[1], rotate_angle)
        m = jnp.asarray(rotation_matrix(page_hw, rot_hw, rotate_angle))
        soft = apply_affine(soft, m, order=1, out_shape=out_hw)
        hard = apply_affine(hard, m, order=0, out_shape=out_hw)
    if rot90_k:
        soft = jnp.rot90(soft, rot90_k, axes=(0, 1))
        hard = jnp.rot90(hard, rot90_k, axes=(0, 1))

    new_inp = jnp.concatenate(
        [
            (soft[..., :n_soft] > BINARIZE_THRESHOLD).astype(inp.dtype),
            hard.astype(inp.dtype),
        ],
        axis=-1,
    )
    label_oh = rebinarize_one_hot(soft[..., n_soft:n_soft + n_classes])
    new_label = jnp.argmax(label_oh, axis=-1).astype(label.dtype)
    new_valid = soft[..., -1] > 0.5
    return new_inp, new_label, new_valid


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
