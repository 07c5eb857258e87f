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
