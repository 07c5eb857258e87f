"""Rasterizer tests: device paint vs host golden, reference-semantics parity,
determinism, bucketing."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from msau_tpu.data import rasterize as rz
from msau_tpu.data.charset import Charset
from msau_tpu.data.pages import load_funsd_page

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "funsd_sample.json")


@pytest.fixture(scope="module")
def page():
    return load_funsd_page(FIXTURE)


@pytest.fixture(scope="module")
def charset(page):
    return Charset.from_corpus(page.corpus())


class TestPaint:
    def test_device_matches_numpy_golden(self, rng):
        h, w = 64, 96
        n = 50
        y1 = rng.integers(-5, h, n)
        y2 = y1 + rng.integers(0, 20, n)
        x1 = rng.integers(-5, w, n)
        x2 = x1 + rng.integers(0, 30, n)
        boxes = np.stack([y1, y2, x1, x2], -1).astype(np.int32)
        values = rng.integers(0, 100, n).astype(np.int32)
        prog = rz.BoxProgram(boxes, values).clipped(h, w)
        want = rz.paint_boxes_numpy(prog, h, w)
        got = np.asarray(rz.paint_boxes(jnp.asarray(prog.boxes), jnp.asarray(prog.values), h, w))
        np.testing.assert_array_equal(got, want)

    def test_last_write_wins(self):
        prog = rz.BoxProgram.from_lists([(0, 4, 0, 4), (2, 6, 2, 6)], [7, 9])
        got = np.asarray(rz.paint_boxes(jnp.asarray(prog.boxes), jnp.asarray(prog.values), 8, 8))
        assert got[3, 3] == 9  # overlap painted by later box
        assert got[0, 0] == 7

    def test_paint_planes_matches_separate(self, rng):
        h, w = 32, 32
        n = 20
        boxes = np.stack(
            [
                rng.integers(0, h, n),
                rng.integers(0, h, n) + 4,
                rng.integers(0, w, n),
                rng.integers(0, w, n) + 4,
            ],
            -1,
        ).astype(np.int32)
        boxes[:, 1] = np.clip(boxes[:, 1], 0, h)
        boxes[:, 3] = np.clip(boxes[:, 3], 0, w)
        values = rng.integers(1, 9, n).astype(np.int32)
        plane_ids = rng.integers(0, 3, n).astype(np.int32)
        fused = np.asarray(
            rz.paint_planes(jnp.asarray(boxes), jnp.asarray(values), jnp.asarray(plane_ids), h, w, 3)
        )
        for p in range(3):
            sel = plane_ids == p
            prog = rz.BoxProgram(boxes[sel], values[sel])
            want = rz.paint_boxes_numpy(prog, h, w)
            np.testing.assert_array_equal(fused[p], want)


def reference_style_rasterize(page, charset, scale_const=3.0):
    """Independent host reimplementation of the reference training-generator
    geometry (data_generator_funsd.py:293-395), deterministic path."""
    lines = page.lines
    heights = [l.box[3] - l.box[1] for l in lines]
    median_h = float(np.median(heights))
    min_x = min(l.box[0] for l in lines) - median_h * 2
    min_y = min(l.box[1] for l in lines) - median_h * 2
    max_x = max(l.box[2] for l in lines) + median_h * 2
    max_y = max(l.box[3] for l in lines) + median_h * 2
    scale = scale_const / median_h
    H, W = int((max_y - min_y) * scale), int((max_x - min_x) * scale)
    inp = np.zeros((H, W), np.int32)
    sep = np.zeros((H, W), np.int32)
    lm = np.zeros((H, W), np.int32)
    out = np.zeros((H, W), np.int32)
    for line in lines:
        x1, y1, x2, y2 = line.box
        x1, y1 = int((x1 - min_x) * scale), int((y1 - min_y) * scale)
        x2, y2 = int((x2 - min_x) * scale), int((y2 - min_y) * scale)
        text = line.text
        if not text:
            continue
        out[y2 - 1 : y2, x1:x2] = line.label
        lm[y2 : y2 + 1, x1:x2] = 1
        cfw = max(1.0 * (x2 - x1) / len(text), 1.0)
        cw = max(0.9 * cfw, 1.0)
        cw = min(cw, int((y2 - y1) * 1.0))
        for idx, c in enumerate(text):
            cid = charset.tok_to_id.get(c, charset.blank_idx)
            off = x1 + idx * cfw
            sx, ex = int(off), int(off + cw)
            inp[y1:y2, sx:ex] = cid
            sep[y1:y2, ex - 1 : ex] = cid
    return inp, sep, lm, out, (H, W)


class TestChargridParity:
    def test_matches_reference_semantics(self, page, charset):
        want_inp, want_sep, want_lm, want_out, (H, W) = reference_style_rasterize(page, charset)
        progs = rz.build_chargrid_programs(
            page, charset, scale_min=3.0, scale_max=3.0, label_style="underline"
        )
        assert (progs.height, progs.width) == (H, W)
        got_inp = rz.paint_boxes_numpy(progs.char, H, W)
        got_sep = rz.paint_boxes_numpy(progs.char_sep, H, W)
        got_lm = rz.paint_boxes_numpy(progs.line_mask, H, W)
        got_out = rz.paint_boxes_numpy(progs.label, H, W)
        np.testing.assert_array_equal(got_inp, want_inp)
        np.testing.assert_array_equal(got_sep, want_sep)
        np.testing.assert_array_equal(got_lm, want_lm)
        np.testing.assert_array_equal(got_out, want_out)

    def test_kv_variant_planes(self, page):
        charset = Charset.from_corpus(page.corpus() + " 0")
        progs = rz.build_chargrid_programs(
            page,
            charset,
            scale_min=3.0,
            scale_max=3.0,
            normalize_digits=True,
            char_w_cap_factor=1.2,
            pad_factor_fixed=3.0,
            label_style="box",
        )
        lid = rz.paint_boxes_numpy(progs.line_id, progs.height, progs.width)
        cid = rz.paint_boxes_numpy(progs.char_id, progs.height, progs.width)
        ids = rz.paint_boxes_numpy(progs.char, progs.height, progs.width)
        # every painted char pixel lies inside a line-id region
        assert np.all(lid[ids > 0] > 0)
        # char positions start at 1
        assert cid.max() >= 1
        # digits were normalized: token for '1' never painted, token for '0' is
        tok1 = charset.tok_to_id.get("1")
        tok0 = charset.tok_to_id.get("0")
        if tok1 is not None:
            assert not np.any(ids == tok1)
        assert tok0 is not None and np.any(ids == tok0)

    def test_deterministic_given_seed(self, page, charset):
        a = rz.build_chargrid_programs(
            page, charset, scale_min=2.0, scale_max=4.0,
            rng=np.random.default_rng(42),
        )
        b = rz.build_chargrid_programs(
            page, charset, scale_min=2.0, scale_max=4.0,
            rng=np.random.default_rng(42),
        )
        np.testing.assert_array_equal(a.char.boxes, b.char.boxes)
        assert (a.height, a.width) == (b.height, b.width)


class TestTrainExample:
    def test_bucketed_shapes_and_channels(self, page, charset):
        ex = rz.rasterize_train_example(
            page, charset, n_classes=4, buckets=(256, 512), rng=np.random.default_rng(0)
        )
        h, w, c = ex["input"].shape
        assert h in (256, 512) and w in (256, 512)
        assert c == charset.n_token + 2
        assert ex["label"].shape == (h, w)
        assert ex["valid"].shape == (h, w)
        # some labels painted inside valid region
        lab = np.asarray(ex["label"])
        val = np.asarray(ex["valid"])
        assert lab[val].max() > 0
        assert lab[~val].max() == 0 if (~val).any() else True

    def test_one_hot_consistency(self, page, charset):
        ex = rz.rasterize_train_example(
            page, charset, n_classes=4, buckets=(256,), rng=np.random.default_rng(0)
        )
        onehot = np.asarray(ex["input"][..., : charset.n_token])
        sums = onehot.sum(-1)
        np.testing.assert_array_equal(np.unique(sums), [1.0])  # incl. background ch 0


class TestBuckets:
    def test_bucket_dim(self):
        assert rz.bucket_dim(100, (256, 512)) == 256
        assert rz.bucket_dim(300, (256, 512)) == 512
        assert rz.bucket_dim(9999, (256, 512)) == 512
