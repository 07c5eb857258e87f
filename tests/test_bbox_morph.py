"""Tests for plain bbox ops, overlap filters, skeletonize, map upscaling."""

import numpy as np
import jax.numpy as jnp
import pytest

from msau_tpu.data import bbox as bb
from msau_tpu.ops.morphology import skeletonize, skelet, threshold_and_upscale_map


class TestBBox:
    def test_intersections(self):
        a = (0, 0, 10, 10)
        b = (5, 5, 10, 10)
        c = (20, 20, 5, 5)
        assert bb.check_intersect_bbox(a, b)
        assert not bb.check_intersect_bbox(a, c)
        assert bb.get_intersect_range_vertical_proj(a, b) == 5
        assert bb.get_intersect_range_horizontal_proj(a, b) == 5

    def test_containment(self):
        big = (0, 0, 100, 100)
        small = (10, 10, 20, 10)
        assert bb.check_bbox_contains_each_other(big, small)
        assert bb.check_bbox_contains_each_other(small, big)  # order-free
        assert bb.check_bbox_almost_contains_each_other(big, small)

    def test_min_bbox(self):
        out = bb.get_min_bbox_contains_all([(0, 0, 10, 5), (20, 10, 5, 5)])
        assert out == (0, 0, 25, 15)
        assert bb.get_min_bbox_contains_all([]) is None

    def test_filter_overlap(self):
        boxes = [(10, 10, 20, 20), (0, 0, 100, 100), (200, 0, 210, 10)]
        kept = bb.filter_overlap_boxes(boxes)
        assert (10, 10, 20, 20) not in kept
        assert len(kept) == 2

    def test_filter_overlap_bigger(self):
        boxes = [(0, 0, 50, 50), (2, 2, 48, 48), (100, 100, 120, 120)]
        idx = bb.filter_overlap_boxes_bigger(boxes, return_indices=True)
        assert idx[1] is True      # smaller of the overlapping pair dropped
        assert idx[0] is False and idx[2] is False


class TestSkeleton:
    def test_thick_line_thins(self):
        mask = np.zeros((20, 40), bool)
        mask[8:13, 2:38] = True   # 5px-thick horizontal bar
        sk = np.asarray(skeletonize(jnp.asarray(mask)))
        assert sk.sum() < mask.sum() / 2
        assert sk.sum() >= 30          # line length preserved
        # skeleton is a subset of the input
        assert not np.any(sk & ~mask)
        # still connected along the row band
        rows = np.where(sk.any(axis=1))[0]
        assert len(rows) <= 3

    def test_skelet_pipeline(self):
        img = np.zeros((30, 30), np.float32)
        img[10:16, 5:25] = 255.0
        out = np.asarray(skelet(jnp.asarray(img), thres=150, iters=1))
        assert out.any()
        assert out.dtype == bool

    def test_threshold_and_upscale(self):
        gt = np.zeros((10, 10), np.float32)
        gt[4:6, :] = 255.0
        out = np.asarray(threshold_and_upscale_map((40, 40), jnp.asarray(gt)))
        assert out.shape == (40, 40)
        assert out[20, 20]
        assert not out[0, 0]


def test_packed_closing_matches_per_class(rng):
    """Bit-packed multi-mask closing == per-mask r_closing (the decoder's
    15-class closing rides 2 reduce_windows instead of 30)."""
    import jax.numpy as jnp

    from msau_tpu.ops.morphology import packed_closing, r_closing

    cls = rng.integers(0, 6, (40, 56)).astype(np.int32)
    bits = np.where(cls >= 2, np.left_shift(1, np.maximum(cls - 2, 0)), 0)
    packed = np.asarray(packed_closing(jnp.asarray(bits, jnp.int32), (1, 3)))
    for c in range(2, 6):
        want = np.asarray(r_closing(jnp.asarray(cls == c), (1, 3)))
        got = (packed >> (c - 2)) & 1
        np.testing.assert_array_equal(got.astype(bool), want, err_msg=f"class {c}")
