"""Entry-A word-level chargrid path: FUNSD preprocessing + word-grid
rasterization.

Mirrors the committed FUNSD training pipeline:
  * preprocessing (funsd_preprocessing_word_level.py:60-126): FUNSD ``form``
    JSON → text-line cells + word cells + labels + per-word charset one-hot
    features, pickled per split with a shared charset;
  * rasterization (data_generator_funsd_bert.py:149-186,
    ``get_box_mask_box_label_word``): the grid is in *cell units* — x in
    units of the min per-char width, y in units of the min cell height;
    each word burns its per-char one-hot columns; labels fill text-line
    boxes with label_id + 1.

The per-char burn-in runs on device via the shared box-program painter; the
feature dimension is the charset size (no +2 aux planes here).

BERT / bag-of-words feature variants of the reference
(``getitem_box_bert``/``getitem_box_bow``, data_generator_funsd_bert.py:22-46)
are provided behind optional deps: sentence embeddings need a local
transformers model (zero-egress environments fall back to hashed features),
BOW uses a plain vocabulary count.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from msau_tpu.data.charset import Charset
from msau_tpu.data.pages import FUNSD_LABEL_TO_ID, Page, Word, load_funsd_page
from msau_tpu.data.rasterize import (
    BoxProgram,
    paint_boxes,
    paint_boxes_numpy,
    round_up,
)


@dataclass
class WordGridExample:
    """One page in word-grid form (cells in xywh like the reference)."""

    path: str
    line_boxes: np.ndarray    # [L, 4] (x, y, w, h)
    line_texts: List[str]
    labels: np.ndarray        # [L] int label ids
    word_boxes: np.ndarray    # [Nw, 4] (x, y, w, h)
    word_texts: List[str]
    word_to_line: np.ndarray  # [Nw]
    linking: List[List[Tuple[int, int]]]
    ids: List[int]


def preprocess_funsd_dir(
    annotations_dir: str,
    label_to_id: Dict[str, int] = FUNSD_LABEL_TO_ID,
) -> Tuple[List[WordGridExample], str]:
    """FUNSD annotations dir → examples + corpus text (for charset)."""
    examples = []
    corpus = []
    for path in sorted(glob.glob(os.path.join(annotations_dir, "*.json"))):
        try:
            page = load_funsd_page(path, label_to_id)
        except (KeyError, ValueError):
            continue  # not a FUNSD 'form' JSON
        lb, lt, lab, wb, wt, w2l, linking, ids = [], [], [], [], [], [], [], []
        for li, line in enumerate(page.lines):
            x1, y1, x2, y2 = line.box
            lb.append([x1, y1, x2 - x1 + 1, y2 - y1 + 1])
            lt.append(line.text)
            lab.append(line.label)
            linking.append(line.linking)
            ids.append(line.id)
            for wrd in line.words:
                wx1, wy1, wx2, wy2 = wrd.box
                wb.append([wx1, wy1, wx2 - wx1 + 1, wy2 - wy1 + 1])
                wt.append(wrd.text)
                w2l.append(li)
        corpus.extend(lt)
        examples.append(
            WordGridExample(
                path=path,
                line_boxes=np.asarray(lb, np.float64),
                line_texts=lt,
                labels=np.asarray(lab, np.int32),
                word_boxes=np.asarray(wb, np.float64) if wb else np.zeros((0, 4)),
                word_texts=wt,
                word_to_line=np.asarray(w2l, np.int32),
                linking=linking,
                ids=ids,
            )
        )
    return examples, " ".join(corpus)


def save_preprocessed(path: str, examples: List[WordGridExample], charset: Charset):
    with open(path, "wb") as f:
        pickle.dump({"examples": examples, "charset": charset.chars}, f)


def load_preprocessed(path: str) -> Tuple[List[WordGridExample], Charset]:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return blob["examples"], Charset(chars=blob["charset"])


# ---------------------------------------------------------------------------
# word-grid rasterization (get_box_mask_box_label_word semantics)
# ---------------------------------------------------------------------------
def wordgrid_programs(ex: WordGridExample, charset: Charset):
    """Build char/label box programs in cell-unit grid coordinates.

    Geometry (data_generator_funsd_bert.py:149-181): x-unit = min positive
    per-char width over word cells (zero-length words take the mean ratio),
    y-unit = min cell height; grid size = page extent in those units + 1.
    """
    wb = ex.word_boxes
    lb = ex.line_boxes
    assert len(wb), "page has no word cells"
    all_b = np.concatenate([wb, lb], 0) if len(lb) else wb
    min_x = float(all_b[:, 0].min())
    min_y = float(all_b[:, 1].min())
    max_x = float((wb[:, 0] + wb[:, 2]).max())
    max_y = float((wb[:, 1] + wb[:, 3]).max())
    min_w = float(wb[:, 2].min())
    min_h = float(wb[:, 3].min())

    ratios = np.array(
        [w / len(t) if len(t) else 0.0 for w, t in zip(wb[:, 2], ex.word_texts)]
    )
    mean_ratio = ratios.mean() if len(ratios) else 1.0
    ratios = np.where(ratios == 0.0, mean_ratio, ratios)
    min_scale = float(ratios.min())

    width = int((max_x - min_x) / min_w) + 1
    height = int((max_y - min_y) / min_h) + 1
    # chars live on the min_scale x-grid, which can exceed the min_w grid
    char_width = int((max_x - min_x) / min_scale) + 1
    grid_w = max(width, char_width)

    char_b, char_v = [], []
    for (x, y, w, h), text in zip(wb, ex.word_texts):
        nx = int((x - min_x) / min_scale)
        ny = int((y - min_y) / min_h)
        nw = max(int(w / min_scale), 1)
        nh = max(int(h / min_h), 1)
        ocr_len = len(text) if len(text) else nw
        pcw = max(int(nw / ocr_len), 1)
        # unknown chars map to 0 = zero feature row (transform_from_charset
        # leaves unknown rows all-zero, funsd_preprocessing_word_level.py:50-57)
        ids = [charset.tok_to_id.get(c, 0) for c in text]
        for j, cid in enumerate(ids):
            char_b.append((ny, ny + nh, nx + pcw * j, nx + pcw * (j + 1)))
            char_v.append(int(cid))

    lab_b, lab_v = [], []
    for (x, y, w, h), label in zip(lb, ex.labels):
        nx = int((x - min_x) / min_w)
        ny = int((y - min_y) / min_h)
        nw = max(int(w / min_w), 1)
        nh = max(int(h / min_h), 1)
        lab_b.append((ny, ny + nh, nx, nx + nw))
        lab_v.append(int(label) + 1)

    char = BoxProgram.from_lists(char_b, char_v).clipped(height, grid_w)
    lab = BoxProgram.from_lists(lab_b, lab_v).clipped(height, grid_w)
    return height, grid_w, char, lab


def rasterize_wordgrid(
    ex: WordGridExample,
    charset: Charset,
    pad_multiple: int = 8,
) -> Dict[str, np.ndarray]:
    """Paint the word grid on device → {"input": [H,W,n_token] one-hot
    (channel 0 zeroed like the reference's all-zero background rows),
    "label": [H,W] int, "valid": [H,W] bool}."""
    h, w, char, lab = wordgrid_programs(ex, charset)
    hb = round_up(h, pad_multiple)
    wb = round_up(w, pad_multiple)
    cap = round_up(max(len(char.values), 1), 512)
    charp = char.padded(cap)
    labp = lab.padded(round_up(max(len(lab.values), 1), 128))
    ids = paint_boxes(jnp.asarray(charp.boxes), jnp.asarray(charp.values), hb, wb)
    label = paint_boxes(jnp.asarray(labp.boxes), jnp.asarray(labp.values), hb, wb)
    onehot = jnp.asarray(
        jnp.eye(charset.n_token, dtype=jnp.float32)[ids]
    )
    # reference feature rows for unknown chars are all-zero
    # (transform_from_charset leaves them zero); background pixels carry id 0
    # whose one-hot row is channel 0 — zero it to match "no character here".
    onehot = onehot.at[..., 0].set(0.0)
    rows = np.arange(hb)[:, None]
    cols = np.arange(wb)[None, :]
    valid = (rows < h) & (cols < w)
    return {
        "input": np.asarray(onehot),
        "label": np.asarray(label),
        "valid": valid,
    }


# ---------------------------------------------------------------------------
# alternative box features (BERT / BOW), gated
# ---------------------------------------------------------------------------
def bow_features(texts: Sequence[str], vocab: Optional[Dict[str, int]] = None):
    """Bag-of-words per text (getitem_box_bow equivalent)."""
    if vocab is None:
        vocab = {}
        for t in texts:
            for tok in t.lower().split():
                vocab.setdefault(tok, len(vocab))
    mat = np.zeros((len(texts), max(len(vocab), 1)), np.float32)
    for i, t in enumerate(texts):
        for tok in t.lower().split():
            j = vocab.get(tok)
            if j is not None:
                mat[i, j] += 1.0
    return mat, vocab


def char_ngram_features(
    texts: Sequence[str],
    dim: int = 768,
    n_buckets: int = 4096,
    ngram_sizes: Tuple[int, ...] = (1, 2, 3),
) -> np.ndarray:
    """Deterministic character-ngram embedding (the documented local
    fallback for the BERT feature variant).

    Hash-bucketed char 1/2/3-gram counts projected to ``dim`` with a fixed
    Gaussian matrix and L2-normalized — similar strings map to nearby
    vectors, unlike per-text random noise.  Hashing uses crc32, so features
    are stable across processes (Python's ``hash`` is salted per run).
    """
    import zlib

    counts = np.zeros((len(texts), n_buckets), np.float32)
    for i, t in enumerate(texts):
        s = f"\x02{t}\x03"  # boundary markers
        for n in ngram_sizes:
            for j in range(len(s) - n + 1):
                b = zlib.crc32(s[j : j + n].encode("utf-8")) % n_buckets
                counts[i, b] += 1.0
    proj = np.random.default_rng(777).standard_normal(
        (n_buckets, dim)
    ).astype(np.float32) / np.sqrt(n_buckets)
    feats = counts @ proj
    norm = np.linalg.norm(feats, axis=1, keepdims=True)
    return feats / np.maximum(norm, 1e-8)


def sentence_embedding_features(
    texts: Sequence[str],
    model_name: str = "bert-base-nli-mean-tokens",
    dim: int = 768,
    return_backend: bool = False,
):
    """Sentence-embedding features (getitem_box_bert equivalent).

    Tries a local transformers model; in zero-egress environments falls
    back to :func:`char_ngram_features` — a deterministic char-ngram
    projection of the same width (documented, not hashed noise), so the
    pipeline stays runnable AND the features stay meaningful.  Pass
    ``return_backend=True`` to learn which backend produced the features
    (benchmarks label their output with it).
    """
    try:  # pragma: no cover - depends on local model availability
        from transformers import AutoModel, AutoTokenizer
        import torch

        tok = AutoTokenizer.from_pretrained(model_name, local_files_only=True)
        mdl = AutoModel.from_pretrained(model_name, local_files_only=True)
        with torch.no_grad():
            enc = tok(list(texts), padding=True, truncation=True, return_tensors="pt")
            out = mdl(**enc).last_hidden_state.mean(1)
        feats, backend = out.numpy(), model_name
    except Exception:
        feats, backend = char_ngram_features(texts, dim=dim), "char-ngram"
    return (feats, backend) if return_backend else feats
