"""Native rasterlib: native vs numpy parity + integration through the
chargrid builder."""

import os

import numpy as np
import pytest

import msau_tpu.native as nat
from msau_tpu.data.charset import Charset
from msau_tpu.data.pages import load_funsd_page
from msau_tpu.data import rasterize as rz

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "funsd_sample.json")


@pytest.fixture
def random_case(rng):
    L = 30
    boxes = np.zeros((L, 4), np.int32)
    boxes[:, 0] = rng.integers(0, 200, L)
    boxes[:, 2] = boxes[:, 0] + rng.integers(10, 120, L)
    boxes[:, 1] = rng.integers(0, 300, L)
    boxes[:, 3] = boxes[:, 1] + rng.integers(5, 15, L)
    lens = rng.integers(0, 16, L)
    off = np.zeros(L + 1, np.int32)
    off[1:] = np.cumsum(lens)
    ids = rng.integers(1, 80, off[-1]).astype(np.int32)
    return boxes, off, ids


class TestNative:
    def test_char_records_native_vs_numpy(self, random_case):
        if not nat.native_available():
            pytest.skip("librasterlib.so not built")
        boxes, off, ids = random_case
        got = nat.char_records(boxes, off, ids, 1.2)
        want = nat._char_records_numpy(boxes, off, ids, 1.2)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)

    def test_chargrid_builder_unchanged_by_backend(self, monkeypatch):
        """build_chargrid_programs output is identical with and without
        the native backend."""
        page = load_funsd_page(FIXTURE)
        cs = Charset.from_corpus(page.corpus())
        a = rz.build_chargrid_programs(page, cs, scale_min=3.0, scale_max=3.0)
        monkeypatch.setattr(nat, "_load", lambda: None)
        b = rz.build_chargrid_programs(page, cs, scale_min=3.0, scale_max=3.0)
        np.testing.assert_array_equal(a.char.boxes, b.char.boxes)
        np.testing.assert_array_equal(a.char.values, b.char.values)
        np.testing.assert_array_equal(a.label.boxes, b.label.boxes)
