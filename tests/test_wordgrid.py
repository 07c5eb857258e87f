"""Entry-A word-grid tests: parity with the reference's cell-unit
rasterization loop, preprocessing round-trip, feature variants."""

import os

import numpy as np
import pytest

from msau_tpu.data.charset import Charset
from msau_tpu.data import wordgrid as wg
from msau_tpu.data.rasterize import paint_boxes_numpy

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def examples_and_charset():
    exs, corpus = wg.preprocess_funsd_dir(FIXTURE_DIR)
    # fixture dir holds kv_sample.json too (no 'form' key) -> only funsd file parses
    exs = [e for e in exs if len(e.word_boxes)]
    return exs, Charset.from_corpus(corpus)


def reference_wordgrid(ex, charset):
    """Independent replay of get_box_mask_box_label_word
    (data_generator_funsd_bert.py:149-186) with charset one-hot features."""
    wb, lb = ex.word_boxes, ex.line_boxes
    allb = np.concatenate([wb, lb], 0)
    min_x, min_y = allb[:, 0].min(), allb[:, 1].min()
    max_x = (wb[:, 0] + wb[:, 2]).max()
    max_y = (wb[:, 1] + wb[:, 3]).max()
    min_w, min_h = wb[:, 2].min(), wb[:, 3].min()
    ratios = [w / len(t) if len(t) else 0.0 for w, t in zip(wb[:, 2], ex.word_texts)]
    mean_r = sum(ratios) / len(ratios)
    ratios = [r if r else mean_r for r in ratios]
    min_scale = min(ratios)

    H = int((max_y - min_y) / min_h) + 1
    W = int((max_x - min_x) / min_w) + 1
    CW = int((max_x - min_x) / min_scale) + 1
    GW = max(W, CW)
    ids = np.zeros((H, GW), np.int32)
    label = np.zeros((H, GW), np.int32)
    for (x, y, w, h), text in zip(wb, ex.word_texts):
        nx = int((x - min_x) / min_scale)
        ny = int((y - min_y) / min_h)
        nw = max(int(w / min_scale), 1)
        nh = max(int(h / min_h), 1)
        ocr_len = len(text) if len(text) else nw
        pcw = max(int(nw / ocr_len), 1)
        for j, c in enumerate(text):
            cid = charset.tok_to_id.get(c, 0)
            ids[ny : ny + nh, nx + pcw * j : nx + pcw * (j + 1)] = cid
    for (x, y, w, h), lab in zip(lb, ex.labels):
        nx = int((x - min_x) / min_w)
        ny = int((y - min_y) / min_h)
        nw = max(int(w / min_w), 1)
        nh = max(int(h / min_h), 1)
        label[ny : ny + nh, nx : nx + nw] = lab + 1
    return ids, label, (H, GW)


class TestWordGrid:
    def test_matches_reference_loop(self, examples_and_charset):
        exs, charset = examples_and_charset
        ex = exs[0]
        want_ids, want_label, (H, W) = reference_wordgrid(ex, charset)
        h, w, char, lab = wg.wordgrid_programs(ex, charset)
        assert (h, w) == (H, W)
        got_ids = paint_boxes_numpy(char, h, w)
        got_label = paint_boxes_numpy(lab, h, w)
        np.testing.assert_array_equal(got_ids, want_ids)
        np.testing.assert_array_equal(got_label, want_label)

    def test_rasterize_wordgrid_output(self, examples_and_charset):
        exs, charset = examples_and_charset
        out = wg.rasterize_wordgrid(exs[0], charset)
        h, w, c = out["input"].shape
        assert c == charset.n_token
        assert out["input"][..., 0].max() == 0.0  # background channel zeroed
        assert out["label"].max() >= 1            # labels are id+1
        # one-hot rows: at most one channel set
        assert out["input"].sum(-1).max() <= 1.0

    def test_preprocess_pickle_roundtrip(self, examples_and_charset, tmp_path):
        exs, charset = examples_and_charset
        p = tmp_path / "funsd.pkl"
        wg.save_preprocessed(str(p), exs, charset)
        exs2, cs2 = wg.load_preprocessed(str(p))
        assert len(exs2) == len(exs)
        assert cs2.n_token == charset.n_token
        np.testing.assert_array_equal(exs2[0].word_boxes, exs[0].word_boxes)


class TestBoxFeatures:
    def test_bow(self):
        mat, vocab = wg.bow_features(["hello world", "hello there"])
        assert mat.shape == (2, 3)
        assert mat[0, vocab["hello"]] == 1

    def test_sentence_embeddings_fallback(self):
        feats, backend = wg.sentence_embedding_features(
            ["a", "b", "a"], dim=16, return_backend=True
        )
        assert feats.shape == (3, 16)
        assert backend  # benchmark labeling requires a backend name
        np.testing.assert_array_equal(feats[0], feats[2])  # deterministic

    def test_sentence_embeddings_real_transformer_path(self, tmp_path):
        """Drive the actual transformers backend (VERDICT round-2 #9) with a
        self-provisioned tiny local BERT — no downloads, real code path.

        Reference loads sentence-transformers at module level
        (funsd_preprocessing_word_level.py:11); our gated path must execute
        the transformers branch when a local model exists, and report that
        backend (so config-3 benchmarks can't silently mean char-ngram)."""
        pytest.importorskip("transformers")
        import os

        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        from transformers import BertConfig, BertModel, BertTokenizer

        d = str(tmp_path)
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "account", "number", "total", "##er", "a", "b"]
        vp = os.path.join(d, "vocab.txt")
        with open(vp, "w") as f:
            f.write("\n".join(vocab))
        tok = BertTokenizer(vp)
        cfg = BertConfig(vocab_size=len(vocab), hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=64, max_position_embeddings=64)
        tok.save_pretrained(d)
        BertModel(cfg).save_pretrained(d)

        feats, backend = wg.sentence_embedding_features(
            ["account number", "total"], model_name=d, return_backend=True
        )
        assert backend == d  # transformers branch, NOT "char-ngram"
        assert feats.shape == (2, 32)
        assert np.isfinite(feats).all()

    def test_char_ngram_features_are_meaningful(self):
        """Fallback embeddings carry string similarity, not hashed noise:
        near-identical strings land closer than unrelated ones."""
        feats = wg.char_ngram_features(
            ["account number", "account numbre", "xyzzy qwerty"], dim=64
        )
        # unit-normalized
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)
        sim_close = feats[0] @ feats[1]
        sim_far = feats[0] @ feats[2]
        assert sim_close > sim_far + 0.3
