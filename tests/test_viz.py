"""Direct tests for utils/viz.py (VERDICT r3 #9): deterministic pixels on
a tiny synthetic page, no CLI round trip.

Covers the reference's visual-debugging surface
(/root/reference/inference/generic_util.py:116-207) as reimplemented
PIL-only in msau_tpu/utils/viz.py.
"""

import numpy as np
import pytest

pytest.importorskip("PIL")

from msau_tpu.utils import viz


def _class_map():
    m = np.zeros((32, 32), np.int64)
    m[4:10, 4:20] = 2      # one field blob
    m[20:26, 8:16] = 5     # another class
    return m


def test_render_class_map_deterministic_pixels():
    img = viz.render_class_map(_class_map())
    a = np.asarray(img)
    assert a.shape == (32, 32, 3)
    # background is palette[0] = black
    assert tuple(a[0, 0]) == (0, 0, 0)
    # class regions get their exact palette colors
    assert tuple(a[5, 5]) == viz.class_color(2)
    assert tuple(a[22, 10]) == viz.class_color(5)
    # rendering is a pure function
    b = np.asarray(viz.render_class_map(_class_map()))
    np.testing.assert_array_equal(a, b)


def test_visualize_kv_results_draws_boxes_and_gt():
    m = _class_map()
    values = [("", None)] * 2 + [("hello", [(4, 4, 20, 10)])]
    img = viz.visualize_kv_results(
        m, values, class_names=["NUL", "k", "v_field"], scale=2,
        gt_boxes=[((8, 20, 16, 26), 2)])
    a = np.asarray(img)
    assert a.shape == (64, 64, 3)
    # predicted box outline drawn in magenta at the scaled corner
    assert tuple(a[8, 8]) == (255, 0, 255)
    # GT box outline drawn in red (x1*2, y1*2) = (16, 40) -> row 40, col 16
    assert tuple(a[40, 16]) == (255, 0, 0)


def test_visualize_kv_results_empty_values_noop():
    m = np.zeros((8, 8), np.int64)
    img = viz.visualize_kv_results(m, [], scale=1)
    np.testing.assert_array_equal(np.asarray(img), 0)


def test_render_chargrid_marks_nonzero_tokens():
    ids = np.zeros((8, 8), np.int64)
    ids[2, 3] = 7
    a = np.asarray(viz.render_chargrid(ids))
    assert a.shape == (8, 8, 3)
    assert tuple(a[0, 0]) == (0, 0, 0)
    assert (a[2, 3] >= 60).all()  # token pixels are visibly lit
    # stable hash-coloring: same id -> same color
    ids2 = np.zeros((8, 8), np.int64)
    ids2[5, 5] = 7
    b = np.asarray(viz.render_chargrid(ids2))
    np.testing.assert_array_equal(a[2, 3], b[5, 5])
