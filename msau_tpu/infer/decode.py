"""KV decoding: on-device segmentation-map → field components, host strings.

The reference decoder (inference/kv_model.py:151-261) runs per class on the
CPU: argmax map → scipy closing → scipy connected components → pick the
largest-bbox component (topmost for multi-line fields) → map components to
OCR line ids → assemble the value string in reading order, slicing
substrings via the char-position mask when a line is shared between fields.

Here everything image-shaped stays on the TPU in one jitted program
(`decode_fields_device`): morphology (reduce_window), CCL (label
propagation), component stats and selection, and the component↔line overlap
/ char-position reductions (segment ops).  Only tiny [n_class, ...] arrays
reach the host, where `extract_values` replays the exact reference string
policy over them.

Known intentional divergences from the reference (documented, exercised in
tests):
  * bbox-area ties: reference argsort picks the highest scipy label; we pick
    the raster-first root.
  * char positions are taken over pixels whose painted line_id equals the
    line (reference slices the line's rectangle, which can include pixels
    of an overlapping neighbor line).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msau_tpu.infer.reading_order import sort_box_reading_order
from msau_tpu.infer.schema import FieldSchema
from msau_tpu.ops.ccl import INF, component_stats, connected_components_jax
from msau_tpu.ops.morphology import r_closing


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------
@functools.partial(
    jax.jit,
    static_argnames=("n_class", "num_lines", "k", "min_area", "max_iters"),
)
def decode_fields_device(
    pred: jnp.ndarray,        # [H, W, n_class] probs or logits
    line_id: jnp.ndarray,     # [H, W] int32, 1-based line ids (0 = none)
    char_id: jnp.ndarray,     # [H, W] int32, 1-based char positions
    multiline: jnp.ndarray,   # [n_class] bool
    *,
    n_class: int,
    num_lines: int,
    k: int = 8,
    min_area: int = 5,
    max_iters: int = 64,
) -> Dict[str, jnp.ndarray]:
    """Per-class component selection + line/char reductions, fully on device.

    Returns (all leading dim n_class):
      active       [C]           class has a selected component
      main_bbox    [C, 4]        (x1, y1, x2, y2) of the main component
      alt_bbox     [C, K, 4]     multi-line alt components (area > min_area)
      alt_valid    [C, K]
      line_overlap [C, L+1]      selected components touch line l
      comp_per_line[C, L+1]      #selected components touching line l
      char_min/max [C, L+1]      char-position extremes on line l (0 = none)
      chosen       [C, H, W]     the new_pred_mask equivalent (bool)
    """
    h, w = line_id.shape
    pred_class = jnp.argmax(pred, axis=-1).astype(jnp.int32)
    lid_flat = line_id.reshape(-1)
    cid_flat = char_id.reshape(-1)
    nl = num_lines + 1

    def per_class(c, is_multiline):
        mask = pred_class == c
        closed = r_closing(mask, (1, 3))
        labels = connected_components_jax(closed, max_iters=max_iters)
        stats = component_stats(labels)
        count, area = stats["count"], stats["bbox_area"]
        y1, x1, y2, x2 = stats["y1"], stats["x1"], stats["y2"], stats["x2"]
        exists = (count > 0) & (
            jnp.arange(count.shape[0], dtype=jnp.int32) > 0
        )

        # main component: largest bbox area, or topmost center for
        # multi-line fields (kv_model.py:182-190)
        ycenter2 = jnp.where(exists, y1 + y2, INF)  # 2*ycenter, monotone
        area_key = jnp.where(exists, area, -1)
        main_by_area = jnp.argmax(area_key)
        main_by_top = jnp.argmin(ycenter2)
        main = jnp.where(is_multiline, main_by_top, main_by_area)
        active = exists[main] & (area[main] >= min_area)

        # chosen mask: main + (multi-line) all alts with bbox area > min_area
        alt_ok = exists & (area > min_area)
        is_alt = alt_ok & (jnp.arange(area.shape[0]) != main) & is_multiline
        chosen = active & ((labels == main) | is_alt[labels])

        # top-k alt records for boxes_for_field (multi-line only)
        alt_area = jnp.where(is_alt, area, 0)
        alt_vals, alt_roots = jax.lax.top_k(alt_area, k)
        alt_valid = (alt_vals > 0) & active
        alt_bbox = jnp.stack(
            [x1[alt_roots], y1[alt_roots], x2[alt_roots], y2[alt_roots]], -1
        )
        alt_bbox = jnp.where(alt_valid[:, None], alt_bbox, 0)
        main_bbox = jnp.where(
            active, jnp.stack([x1[main], y1[main], x2[main], y2[main]]), 0
        )

        # line overlap + per-line component counts + char extremes
        ch_flat = chosen.reshape(-1)
        seg = jnp.where(ch_flat, lid_flat, 0)
        overlap_cnt = jax.ops.segment_sum(
            ch_flat.astype(jnp.int32), seg, num_segments=nl
        ).at[0].set(0)
        line_overlap = overlap_cnt > 0

        # count distinct chosen components per line.  One composite-id
        # segment op instead of K+1 scatters: pixel -> (component slot,
        # line) bucket, where slot 0 = main, 1..K = alts, K+1 = not chosen.
        roots = jnp.concatenate([main[None], alt_roots])  # [K+1]
        comp_valid = jnp.concatenate([active[None], alt_valid])
        lbl = labels.reshape(-1)
        slot = jnp.full_like(lbl, k + 1)
        for si in range(k, -1, -1):  # earlier roots win ties (main first)
            slot = jnp.where(lbl == roots[si], si, slot)
        slot = jnp.where(ch_flat, slot, k + 1)
        composite = slot * nl + jnp.where(ch_flat, lid_flat, 0)
        bucket = jax.ops.segment_sum(
            jnp.ones_like(composite), composite, num_segments=(k + 2) * nl
        ).reshape(k + 2, nl)
        per_comp = bucket[: k + 1] > 0                    # [K+1, L+1]
        comp_per_line = jnp.sum(
            per_comp & comp_valid[:, None], axis=0
        ).at[0].set(0)

        cid_masked = jnp.where(ch_flat & (cid_flat > 0), cid_flat, INF)
        char_min = jax.ops.segment_min(cid_masked, seg, num_segments=nl)
        char_min = jnp.where(char_min == INF, 0, char_min).at[0].set(0)
        cid_masked0 = jnp.where(ch_flat, cid_flat, 0)
        char_max = jax.ops.segment_max(cid_masked0, seg, num_segments=nl).at[0].set(0)

        return {
            "active": active,
            "main_bbox": main_bbox,
            "alt_bbox": alt_bbox,
            "alt_valid": alt_valid,
            "line_overlap": line_overlap,
            "comp_per_line": comp_per_line,
            "char_min": char_min,
            "char_max": char_max,
            "chosen": chosen,
        }

    # classes 0/1 (background + first key) are never decoded
    # (kv_model.py:174) — and class 0's huge background components would
    # dominate the vmapped CCL's iteration count, so they are excluded
    # from the computation entirely, not just masked after.
    out2 = jax.vmap(per_class)(
        jnp.arange(2, n_class, dtype=jnp.int32), multiline[2:]
    )

    def pad_front(x):
        pad_shape = (2,) + x.shape[1:]
        return jnp.concatenate([jnp.zeros(pad_shape, x.dtype), x], axis=0)

    return {key: pad_front(v) for key, v in out2.items()}


# ---------------------------------------------------------------------------
# Host side
# ---------------------------------------------------------------------------
class FieldValue(NamedTuple):
    text: str
    boxes: Optional[List[List[int]]]
    intersect_box: Optional[List[int]]
    union_box: Optional[List[int]]


def _union(boxes):
    if not boxes:
        return None
    arr = np.asarray(boxes)
    return [int(arr[:, 0].min()), int(arr[:, 1].min()), int(arr[:, 2].max()), int(arr[:, 3].max())]


def _intersect(boxes):
    if not boxes:
        return None
    arr = np.asarray(boxes)
    return [int(arr[:, 0].max()), int(arr[:, 1].max()), int(arr[:, 2].min()), int(arr[:, 3].min())]


def extract_values(
    device_out: Dict[str, np.ndarray],
    scaled_lines: Sequence,         # Line records with scaled boxes, 1-based ids
    schema: FieldSchema,
) -> List[FieldValue]:
    """Replay the reference string-assembly policy (kv_model.py:220-261) over
    the per-class device outputs."""
    n_class = schema.n_class
    active = np.asarray(device_out["active"])
    overlap = np.asarray(device_out["line_overlap"])
    comp_per_line = np.asarray(device_out["comp_per_line"])
    char_min = np.asarray(device_out["char_min"])
    char_max = np.asarray(device_out["char_max"])
    main_bbox = np.asarray(device_out["main_bbox"])
    alt_bbox = np.asarray(device_out["alt_bbox"])
    alt_valid = np.asarray(device_out["alt_valid"])

    num_lines = len(scaled_lines)
    values: List[FieldValue] = [FieldValue("", None, None, None)] * n_class

    # line_used_count: one per selected component overlapping the line
    # (kv_model.py:214-216), summed over counted classes
    line_used = np.zeros(overlap.shape[1], np.int64)
    for c in range(2, n_class):
        if not active[c] or c in schema.non_count_overlap_fields:
            continue
        line_used += comp_per_line[c]

    for c in range(2, n_class):
        if not active[c]:
            continue
        line_ids = [l for l in range(1, min(num_lines + 1, overlap.shape[1])) if overlap[c, l]]
        if not line_ids:
            continue
        lines = sort_box_reading_order([scaled_lines[i - 1] for i in line_ids])
        value = ""
        line_boxes = []
        for line in lines:
            lid = getattr(line, "id", None)
            if lid is None or lid < 0:
                lid = scaled_lines.index(line) + 1
            line_boxes.append(list(line.box))
            text = line.text
            if line_used[lid] <= 1:
                value += text
            else:
                cmin, cmax = int(char_min[c, lid]), int(char_max[c, lid])
                if cmax == 0:
                    continue
                if cmax > len(text) - 3:
                    cmax = len(text) + 1
                value += text[cmin - 2 if cmin >= 2 else 0 : cmax - 1]
            if c in schema.contain_one_line_fields and len(value) > 2:
                break
            if c in schema.multiple_lines_fields:
                value += "\n"
        if value.endswith("\n"):
            value = value[:-1]

        field_boxes = [list(map(int, alt_bbox[c, j])) for j in range(alt_bbox.shape[1]) if alt_valid[c, j]]
        field_boxes.append(list(map(int, main_bbox[c])))
        merged = _union(line_boxes)
        inter = _intersect(field_boxes + [merged])
        union = _union(field_boxes + [merged])
        values[c] = FieldValue(value, [field_boxes[-1]], inter, union)

    return values
