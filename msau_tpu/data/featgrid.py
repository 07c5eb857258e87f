"""Feature-grid rasterization: dense vector features burned into cell boxes.

Covers the reference's BERT/BOW chargrid variants
(data_generator_funsd_bert.py:64-146): each OCR cell's feature vector
(sentence embedding, bag-of-words, or charset one-hot) fills the cell's
rectangle on a cell-unit grid; labels fill the same rectangles (box-label)
or just the top-left pixel (1-px variants).

TPU-first design: the host paints only a [H, W] int32 *cell-index* grid
(the shared box-program painter, last-write-wins like the reference's slice
assignment) and the device turns it into the dense [H, W, D] feature grid
with one gather — ``feats[idx]`` — instead of writing D channels per box.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msau_tpu.data.rasterize import BoxProgram, paint_boxes
from msau_tpu.data.wordgrid import WordGridExample


def cell_unit_layout(boxes: np.ndarray) -> Tuple[float, float, float, float, int, int]:
    """(min_x, min_y, min_w, min_h, H, W) for the cell-unit grid
    (get_min_max_x_y_w_h + grid sizing, data_generator_funsd_bert.py:49-75)."""
    x, y, w, h = boxes.T
    min_x, min_y = float(x.min()), float(y.min())
    max_x = float((x + w).max())
    max_y = float((y + h).max())
    min_w, min_h = float(w.min()), float(h.min())
    width = int((max_x - min_x) / min_w) + 1
    height = int((max_y - min_y) / min_h) + 1
    return min_x, min_y, min_w, min_h, height, width


def cell_index_programs(
    boxes: np.ndarray,          # [N, 4] xywh
    labels: Optional[np.ndarray] = None,
    style: str = "box",         # "box" | "box_mask_px_label" | "px"
) -> Tuple[int, int, BoxProgram, BoxProgram]:
    """Cell-index plane + label plane for the three reference loaders:

    * "box":   features fill cell rects, labels fill cell rects
      (get_box_mask_box_label :64-93)
    * "box_mask_px_label": features fill rects, labels only top-left px
      (get_box_mask_1_pixel_label :96-124)
    * "px":    features and labels only at the top-left px
      (get_1px_mask_1_px_label :127-146)
    """
    min_x, min_y, min_w, min_h, height, width = cell_unit_layout(boxes)
    x, y, w, h = boxes.T
    nx = ((x - min_x) / min_w).astype(np.int64)
    ny = ((y - min_y) / min_h).astype(np.int64)
    nw = np.maximum((w / min_w).astype(np.int64), 1)
    nh = np.maximum((h / min_h).astype(np.int64), 1)

    if style == "px":
        idx_boxes = np.stack([ny, ny + 1, nx, nx + 1], -1)
    else:
        idx_boxes = np.stack([ny, ny + nh, nx, nx + nw], -1)
    idx_vals = np.arange(1, len(boxes) + 1)
    idx_prog = BoxProgram(
        idx_boxes.astype(np.int32), idx_vals.astype(np.int32)
    ).clipped(height, width)

    if labels is None:
        lab_prog = BoxProgram.empty()
    else:
        if style == "box":
            lab_boxes = np.stack([ny, ny + nh, nx, nx + nw], -1)
        else:
            lab_boxes = np.stack([ny, ny + 1, nx, nx + 1], -1)
        lab_prog = BoxProgram(
            lab_boxes.astype(np.int32), (np.asarray(labels) + 1).astype(np.int32)
        ).clipped(height, width)
    return height, width, idx_prog, lab_prog


@jax.jit
def gather_features(idx_grid: jnp.ndarray, feats: jnp.ndarray) -> jnp.ndarray:
    """[H, W] int32 cell ids (1-based; 0 = background) + [N, D] features ->
    [H, W, D]; background rows are zero."""
    padded = jnp.concatenate([jnp.zeros_like(feats[:1]), feats], axis=0)
    return jnp.take(padded, idx_grid, axis=0)


def rasterize_feature_example(
    ex: WordGridExample,
    feats: np.ndarray,                 # [n_lines, D] per-cell features
    style: str = "box",
) -> Dict[str, np.ndarray]:
    """Full feature-grid example from text-line cells (BERT/BOW loaders)."""
    assert len(ex.line_boxes) == len(feats)
    h, w, idx_prog, lab_prog = cell_index_programs(
        ex.line_boxes, ex.labels, style=style
    )
    idx_grid = paint_boxes(
        jnp.asarray(idx_prog.boxes), jnp.asarray(idx_prog.values), h, w
    )
    label = paint_boxes(
        jnp.asarray(lab_prog.boxes), jnp.asarray(lab_prog.values), h, w
    )
    grid = gather_features(idx_grid, jnp.asarray(feats, jnp.float32))
    return {
        "input": np.asarray(grid),
        "label": np.asarray(label),
        "valid": np.ones((h, w), bool),
    }
