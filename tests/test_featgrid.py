"""Feature-grid rasterization tests vs a direct replay of the reference
BERT/BOW loader geometry."""

import os

import numpy as np
import pytest

from msau_tpu.data import featgrid as fg
from msau_tpu.data import wordgrid as wg
from msau_tpu.data.rasterize import paint_boxes_numpy

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def example():
    exs, _ = wg.preprocess_funsd_dir(FIXTURE_DIR)
    return [e for e in exs if len(e.word_boxes)][0]


def reference_box_mask_box_label(boxes, feats, labels):
    """Direct replay of get_box_mask_box_label (data_generator_funsd_bert.py:64-93)."""
    x, y, w, h = boxes.T
    min_x, min_y = x.min(), y.min()
    max_x, max_y = (x + w).max(), (y + h).max()
    min_w, min_h = w.min(), h.min()
    W = int((max_x - min_x) / min_w) + 1
    H = int((max_y - min_y) / min_h) + 1
    grid = np.zeros((H, W, feats.shape[1]), np.float32)
    label = np.zeros((H, W), np.int32)
    for i in range(len(boxes)):
        nx = int((x[i] - min_x) / min_w)
        ny = int((y[i] - min_y) / min_h)
        nw = max(int(w[i] / min_w), 1)
        nh = max(int(h[i] / min_h), 1)
        grid[ny : ny + nh, nx : nx + nw] = feats[i]
        label[ny : ny + nh, nx : nx + nw] = labels[i] + 1
    return grid, label, (H, W)


class TestFeatureGrid:
    def test_matches_reference_loop(self, example, rng):
        feats = rng.standard_normal((len(example.line_boxes), 16)).astype(np.float32)
        want_grid, want_label, (H, W) = reference_box_mask_box_label(
            example.line_boxes, feats, example.labels
        )
        out = fg.rasterize_feature_example(example, feats, style="box")
        assert out["input"].shape == (H, W, 16)
        np.testing.assert_allclose(out["input"], want_grid, rtol=1e-6)
        np.testing.assert_array_equal(out["label"], want_label)

    def test_px_styles(self, example, rng):
        feats = rng.standard_normal((len(example.line_boxes), 8)).astype(np.float32)
        out_px = fg.rasterize_feature_example(example, feats, style="px")
        out_boxpx = fg.rasterize_feature_example(
            example, feats, style="box_mask_px_label"
        )
        # px style: features only at single pixels
        n_feat_px = (np.abs(out_px["input"]).sum(-1) > 0).sum()
        assert n_feat_px <= len(example.line_boxes)
        # box_mask_px_label: features fill boxes but labels are single px
        assert (out_boxpx["label"] > 0).sum() <= len(example.line_boxes)
        assert (np.abs(out_boxpx["input"]).sum(-1) > 0).sum() >= n_feat_px

    def test_bert_bow_integration(self, example):
        bow, _ = wg.bow_features(example.line_texts)
        out = fg.rasterize_feature_example(example, bow)
        assert out["input"].shape[-1] == bow.shape[1]
        emb = wg.sentence_embedding_features(example.line_texts, dim=32)
        out2 = fg.rasterize_feature_example(example, emb)
        assert out2["input"].shape[-1] == 32
