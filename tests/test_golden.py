"""Golden-file regression test: the chargrid of the FUNSD fixture must stay
bit-identical across refactors (guards the rasterizer geometry)."""

import os

import numpy as np

from msau_tpu.data import Charset, load_funsd_page, rasterize as rz

HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(HERE, "fixtures", "chargrid_golden.npz")
FIXTURE = os.path.join(HERE, "fixtures", "funsd_sample.json")


def test_chargrid_matches_golden():
    page = load_funsd_page(FIXTURE)
    cs = Charset.from_corpus(page.corpus())
    g = np.load(GOLDEN)
    want_charset = g["charset"].tobytes().decode("utf-32-le")
    assert cs.chars == want_charset, "charset derivation changed"
    progs = rz.build_chargrid_programs(page, cs, scale_min=3.0, scale_max=3.0)
    np.testing.assert_array_equal(
        rz.paint_boxes_numpy(progs.char, progs.height, progs.width), g["ids"]
    )
    np.testing.assert_array_equal(
        rz.paint_boxes_numpy(progs.label, progs.height, progs.width), g["label"]
    )
    np.testing.assert_array_equal(
        rz.paint_boxes_numpy(progs.char_sep, progs.height, progs.width), g["sep"]
    )
    np.testing.assert_array_equal(
        rz.paint_boxes_numpy(progs.line_mask, progs.height, progs.width),
        g["line_mask"],
    )
