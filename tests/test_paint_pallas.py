"""Pallas paint kernel parity with the XLA/numpy painters (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from msau_tpu.data.rasterize import BoxProgram, paint_boxes_numpy
from msau_tpu.ops.paint_pallas import paint_boxes_pallas


class TestPaintPallas:
    @pytest.mark.parametrize("hw", [(128, 128), (256, 384)])
    def test_matches_numpy_golden(self, rng, hw):
        h, w = hw
        n = 200
        y1 = rng.integers(0, h, n)
        y2 = np.minimum(y1 + rng.integers(0, 12, n), h)
        x1 = rng.integers(0, w, n)
        x2 = np.minimum(x1 + rng.integers(0, 24, n), w)
        boxes = np.stack([y1, y2, x1, x2], -1).astype(np.int32)
        values = rng.integers(1, 99, n).astype(np.int32)
        want = paint_boxes_numpy(BoxProgram(boxes, values), h, w)
        got = np.asarray(
            paint_boxes_pallas(
                jnp.asarray(boxes), jnp.asarray(values), h, w, interpret=True
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_cross_tile_boxes(self, rng):
        """Boxes spanning tile boundaries paint correctly in both tiles."""
        h, w = 256, 128
        boxes = np.array([[120, 140, 10, 50], [0, 256, 100, 101]], np.int32)
        values = np.array([7, 9], np.int32)
        want = paint_boxes_numpy(BoxProgram(boxes, values), h, w)
        got = np.asarray(
            paint_boxes_pallas(
                jnp.asarray(boxes), jnp.asarray(values), h, w,
                tile_h=128, interpret=True,
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_empty_boxes_noop(self):
        boxes = np.zeros((8, 4), np.int32)
        values = np.zeros((8,), np.int32)
        got = np.asarray(
            paint_boxes_pallas(jnp.asarray(boxes), jnp.asarray(values), 128, 128,
                               interpret=True)
        )
        assert got.sum() == 0
