"""Rectangular morphology as XLA reduce_window ops.

Replaces the scipy maximum_filter / minimum_filter pipeline used by the
reference decoder (inference/morph_util.py:65-84) with on-device windowed
reductions, preserving scipy's exact geometry:

* window for output i spans input [i - size//2, i - size//2 + size)
  (scipy origin=0 convention, left-heavy for even sizes);
* borders behave like mode='constant', cval=0 — i.e. max-filters pad with 0
  (no-op for non-negative inputs) and min-filters pad with 0 (borders erode),
  matching scipy defaults the reference relies on.

All ops take [..., H, W] float/bool/int arrays; the filter applies to the
last two axes.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Size2 = Union[int, Tuple[int, int]]


def _normalize_size(size: Size2) -> Tuple[int, int]:
    if isinstance(size, int):
        return (size, size)
    return tuple(size)  # type: ignore[return-value]


def _pad_cfg(size: Tuple[int, int]):
    """scipy origin=0 padding: lo = size//2, hi = size - 1 - size//2."""
    return [(s // 2, s - 1 - s // 2) for s in size]


def _window_reduce(x: jnp.ndarray, size: Tuple[int, int], init, op) -> jnp.ndarray:
    nd = x.ndim
    window = (1,) * (nd - 2) + size
    pads = [(0, 0)] * (nd - 2) + _pad_cfg(size)
    # constant-pad with cval=0 (scipy default), then VALID reduce
    padded = jnp.pad(x, pads, constant_values=0)
    return lax.reduce_window(
        padded, init, op, window, (1,) * nd, padding="VALID"
    )


def r_dilation(image: jnp.ndarray, size: Size2) -> jnp.ndarray:
    """Dilation = rectangular maximum filter (morph_util.py:65-67)."""
    size = _normalize_size(size)
    dtype = image.dtype
    x = image.astype(jnp.float32) if dtype == jnp.bool_ else image
    init = jnp.asarray(-jnp.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    # cval=0 padding means padded cells contribute 0 to the max
    y = _window_reduce(x, size, init, lax.max)
    return y.astype(dtype) if dtype == jnp.bool_ else y


def r_erosion(image: jnp.ndarray, size: Size2) -> jnp.ndarray:
    """Erosion = rectangular minimum filter with cval=0 borders
    (morph_util.py:70-72; scipy minimum_filter default cval erodes borders)."""
    size = _normalize_size(size)
    dtype = image.dtype
    x = image.astype(jnp.float32) if dtype == jnp.bool_ else image
    init = jnp.asarray(jnp.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).max
    y = _window_reduce(x, size, init, lax.min)
    return y.astype(dtype) if dtype == jnp.bool_ else y


def r_opening(image: jnp.ndarray, size: Size2) -> jnp.ndarray:
    return r_dilation(r_erosion(image, size), size)


def r_closing(image: jnp.ndarray, size: Size2) -> jnp.ndarray:
    return r_erosion(r_dilation(image, size), size)


def packed_closing(masks_bits: jnp.ndarray, size: Size2) -> jnp.ndarray:
    """Closing of up to 32 boolean masks packed as int32 bit planes, in TWO
    reduce_windows total (vs 2 per mask): dilation = windowed bitwise OR
    with 0 borders, erosion = windowed bitwise AND with 0 borders — exactly
    ``r_closing``'s scipy cval=0 semantics, applied to every bit at once.
    The KV decoder packs its per-class masks this way (a 15-class vmap of
    r_closing cost ~6 ms at 512²; this is 2 windows)."""
    size = _normalize_size(size)
    assert masks_bits.dtype == jnp.int32, masks_bits.dtype
    dilated = _window_reduce(
        masks_bits, size, jnp.asarray(0, jnp.int32), lax.bitwise_or
    )
    # cval=0 padding erodes borders per bit, matching r_erosion
    return _window_reduce(
        dilated, size, jnp.asarray(-1, jnp.int32), lax.bitwise_and
    )


# ---------------------------------------------------------------------------
# skeletonization + map upscaling (inference/morph_util.py:217-241)
# ---------------------------------------------------------------------------
def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Zero-padded 2-D shift."""
    h, w = x.shape
    return jnp.roll(
        jnp.pad(x, 1), (dy, dx), axis=(0, 1)
    )[1 : h + 1, 1 : w + 1]


@functools.partial(jax.jit, static_argnames=("max_iters",))
def skeletonize(mask: jnp.ndarray, max_iters: int = 64) -> jnp.ndarray:
    """Zhang-Suen thinning on a boolean [H, W] mask — the on-device analog
    of skimage.morphology.skeletonize used by the reference ``skelet``
    (morph_util.py:217-231).  Same 1-px medial output family, not
    bit-identical to skimage's lookup-table variant."""
    img = mask.astype(jnp.float32)

    def neighbors(p):
        # P2..P9 clockwise from north
        return (
            _shift(p, 1, 0), _shift(p, 1, -1), _shift(p, 0, -1),
            _shift(p, -1, -1), _shift(p, -1, 0), _shift(p, -1, 1),
            _shift(p, 0, 1), _shift(p, 1, 1),
        )

    def subiter(p, phase):
        p2, p3, p4, p5, p6, p7, p8, p9 = neighbors(p)
        ring = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
        b = sum(ring[:-1])
        a = sum(
            jnp.logical_and(ring[i] < 0.5, ring[i + 1] > 0.5).astype(jnp.float32)
            for i in range(8)
        )
        cond_b = (b >= 2) & (b <= 6)
        cond_a = a == 1
        if phase == 0:
            c1 = p2 * p4 * p6 == 0
            c2 = p4 * p6 * p8 == 0
        else:
            c1 = p2 * p4 * p8 == 0
            c2 = p2 * p6 * p8 == 0
        remove = (p > 0.5) & cond_a & cond_b & c1 & c2
        return jnp.where(remove, 0.0, p)

    def body(state):
        p, _, it = state
        p1 = subiter(p, 0)
        p2 = subiter(p1, 1)
        return p2, jnp.any(p2 != p), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    out, _, _ = jax.lax.while_loop(cond, body, (img, jnp.asarray(True), 0))
    return out > 0.5


def skelet(
    img: jnp.ndarray,
    thres: float = 150,
    expand: bool = False,
    expand_horizontal: bool = True,
    iters: int = 1,
    max_thin_iters: int = 64,
) -> jnp.ndarray:
    """threshold → skeletonize → dilate (morph_util.py:217-231)."""
    mask = img > thres
    sk = skeletonize(mask, max_iters=max_thin_iters)
    out = r_dilation(sk, (1 + 2 * iters, 1 + 2 * iters))
    if expand:
        pad = 5
        size = (1, pad) if expand_horizontal else (pad, 1)
        out = r_dilation(out, size)
    return out


def threshold_and_upscale_map(
    img_shape: Tuple[int, int],
    gt: jnp.ndarray,
    skeletonize_map: bool = False,
    threshold: float = 150,
    expand: bool = False,
) -> jnp.ndarray:
    """Resize a map to image shape then threshold (morph_util.py:233-241)."""
    h, w = img_shape[:2]
    resized = jax.image.resize(gt.astype(jnp.float32), (h, w), method="bilinear")
    if skeletonize_map:
        return skelet(resized, thres=threshold, expand=expand)
    return resized > threshold
