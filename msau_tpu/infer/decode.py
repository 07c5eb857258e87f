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
from msau_tpu.ops.ccl import (
    INF,
    component_stats,
    connected_components_jax,
    connected_components_multiclass,
    connected_components_multiclass_auto,
)
from msau_tpu.ops.morphology import packed_closing


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------
@functools.partial(
    jax.jit,
    static_argnames=(
        "multiline_classes", "n_class", "num_lines", "k", "min_area",
        "max_iters",
    ),
)
def decode_fields_device(
    pred: jnp.ndarray,        # [H, W, n_class] probs or logits
    line_id: jnp.ndarray,     # [H, W] int32, 1-based line ids (0 = none)
    char_id: jnp.ndarray,     # [H, W] int32, 1-based char positions
    multiline_classes: Tuple[int, ...] = (),   # static class-id set
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
      chosen_class [H, W]        class id of each selected pixel (0 = none)

    Implementation: the reference labels each class's closed mask
    independently (kv_model.py:174-180); here ALL classes share one
    multiclass labeling pass — per-class closed masks are reduced to an
    ownership map (lowest class wins the 1-2 px gap pixels where two
    classes' closings overlap, a contrived tie the reference double-counts)
    and every later reduction is a single composite-id segment op over
    (class/slot, line) buckets instead of a per-class vmap over the grid.
    """
    h, w = line_id.shape
    hw1 = h * w + 1
    c2 = n_class - 2          # classes 0/1 are never decoded (kv_model.py:174)
    pred_class = jnp.argmax(pred, axis=-1).astype(jnp.int32)
    lid_flat = line_id.reshape(-1)
    cid_flat = char_id.reshape(-1)
    nl = num_lines + 1

    # bit-packed per-class closing: every class's (1, 3) closing rides one
    # OR-window + one AND-window over an int32 bit plane (a 15-class vmap
    # of r_closing cost ~6 ms at 512^2; this is 2 reduce_windows)
    assert c2 <= 32, "packed closing supports up to 32 decodable classes"
    bits = jnp.where(
        pred_class >= 2,
        jnp.left_shift(jnp.int32(1), jnp.maximum(pred_class - 2, 0)),
        0,
    ).astype(jnp.int32)
    closed_bits = packed_closing(bits, (1, 3))
    any_fg = closed_bits != 0
    # lowest set bit = lowest class wins the 1-2 px overlap pixels (same
    # tie policy as the previous argmax-first ownership)
    lsb = closed_bits & -closed_bits
    owner = jax.lax.population_count(lsb - jnp.int32(1))
    cls_map = jnp.where(any_fg, owner + 2, 0).astype(jnp.int32)
    # VMEM-resident kernel when the map fits: the XLA while_loop paid HBM
    # for every scan log-step and dominated the serve program (~145 ms of
    # 175 at 512^2 on a noisy argmax map, scripts/exp_serve_families.py).
    # In-core sweeps are ~3 orders cheaper, so the Pallas path spends a
    # 4x sweep budget instead of the pointer-jump acceleration (gathers
    # don't lower well in Mosaic) and still exits early at fixpoint.
    labels = connected_components_multiclass_auto(
        cls_map, max_iters=4 * max_iters)

    # slim per-root stats (VERDICT r3: component_stats' five segment
    # reductions were the decode's largest stage).  A root IS its
    # component's raster-first pixel, so:
    #   * existence needs no count scatter: labels.flat[r-1] == r;
    #   * y1 (min row) is free: (r-1) // W.
    # Only y2/x1/x2 need segment reductions.
    lbl_flat = labels.reshape(-1)
    iota1 = jnp.arange(1, hw1, dtype=jnp.int32)
    exists = jnp.concatenate(
        [jnp.zeros((1,), bool), lbl_flat == iota1]
    )                                                        # [HW+1]
    y1 = jnp.where(
        exists, (jnp.arange(hw1, dtype=jnp.int32) - 1) // w, 0
    )
    rows_flat = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    cols_flat = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    y2 = jax.ops.segment_max(rows_flat, lbl_flat, num_segments=hw1) + 1
    x1 = jax.ops.segment_min(cols_flat, lbl_flat, num_segments=hw1)
    x2 = jax.ops.segment_max(cols_flat, lbl_flat, num_segments=hw1) + 1
    # find_objects slice convention: y2/x2 exclusive, area = bbox area
    area = jnp.where(exists, (y2 - y1) * (x2 - x1), 0)
    # root r sits at linear index r-1, so its class is cls_map.flat[r-1]
    cls_of = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), cls_map.reshape(-1)]
    )                                                        # [HW+1]

    def select_common(c, main):
        in_c = exists & (cls_of == c)
        active = in_c[main] & (area[main] >= min_area)
        main_bbox = jnp.where(
            active, jnp.stack([x1[main], y1[main], x2[main], y2[main]]), 0
        )
        return in_c, active, main_bbox

    def select_simple(c):
        """Single-line class: main = largest-bbox component, no alt slots
        (kv_model.py:182-195 policy).  Skips the [HW+1] top_k entirely —
        only multiline classes pay for alt-component extraction."""
        in_c = exists & (cls_of == c)
        main = jnp.argmax(jnp.where(in_c, area, -1))
        _, active, main_bbox = select_common(c, main)
        zeros_k = jnp.zeros((k,), jnp.int32)
        return {
            "active": active,
            "main_bbox": main_bbox,
            "alt_bbox": jnp.zeros((k, 4), jnp.int32),
            "alt_valid": jnp.zeros((k,), bool),
            "roots": jnp.concatenate([main[None], zeros_k]),
            "roots_valid": jnp.concatenate(
                [active[None], jnp.zeros((k,), bool)]
            ),
        }

    def select_multiline(c):
        """Multi-line class: main = topmost center, alt = all components
        with area > min_area (kv_model.py:196-218 policy)."""
        in_c = exists & (cls_of == c)
        ycenter2 = jnp.where(in_c, y1 + y2, INF)  # 2*ycenter, monotone
        main = jnp.argmin(ycenter2)
        _, active, main_bbox = select_common(c, main)
        is_alt = in_c & (area > min_area) & (jnp.arange(hw1) != main)
        alt_vals, alt_roots = jax.lax.top_k(jnp.where(is_alt, area, 0), k)
        alt_valid = (alt_vals > 0) & active
        alt_bbox = jnp.stack(
            [x1[alt_roots], y1[alt_roots], x2[alt_roots], y2[alt_roots]], -1
        )
        alt_bbox = jnp.where(alt_valid[:, None], alt_bbox, 0)
        return {
            "active": active,
            "main_bbox": main_bbox,
            "alt_bbox": alt_bbox,
            "alt_valid": alt_valid,
            "roots": jnp.concatenate([main[None], alt_roots]),
            "roots_valid": jnp.concatenate([active[None], alt_valid]),
        }

    # split classes by the STATIC multiline set, vmap each group, then
    # reassemble class-ordered [C2, ...] tables with static index lists
    ml_ids = sorted(c for c in set(multiline_classes) if 2 <= c < n_class)
    simple_ids = [c for c in range(2, n_class) if c not in ml_ids]

    def assemble(shape_tail, dtype, simple_out, ml_out):
        out = jnp.zeros((c2,) + shape_tail, dtype)
        if simple_ids:
            out = out.at[jnp.asarray([c - 2 for c in simple_ids])].set(simple_out)
        if ml_ids:
            out = out.at[jnp.asarray([c - 2 for c in ml_ids])].set(ml_out)
        return out

    simple_sel = (
        jax.vmap(select_simple)(jnp.asarray(simple_ids, jnp.int32))
        if simple_ids else None
    )
    ml_sel = (
        jax.vmap(select_multiline)(jnp.asarray(ml_ids, jnp.int32))
        if ml_ids else None
    )
    tails = {
        "active": ((), bool),
        "main_bbox": ((4,), jnp.int32),
        "alt_bbox": ((k, 4), jnp.int32),
        "alt_valid": ((k,), bool),
        "roots": ((k + 1,), jnp.int32),
        "roots_valid": ((k + 1,), bool),
    }
    sel = {
        key: assemble(
            tail, dtype,
            simple_sel[key] if simple_sel is not None else None,
            ml_sel[key] if ml_sel is not None else None,
        )
        for key, (tail, dtype) in tails.items()
    }

    # slot table: root -> global slot ci*(K+1)+j; sentinel = C2*(K+1)
    n_slots = c2 * (k + 1)
    flat_slots = jnp.arange(n_slots, dtype=jnp.int32)
    roots_flat = sel["roots"].reshape(-1)
    valid_flat = sel["roots_valid"].reshape(-1)
    idxs = jnp.where(valid_flat, roots_flat, hw1)  # dump invalid past the end
    slot_of_root = (
        jnp.full((hw1 + 1,), n_slots, jnp.int32).at[idxs].min(flat_slots)[:hw1]
    )
    slot_of_root = slot_of_root.at[0].set(n_slots)

    slot_pix = slot_of_root[lbl_flat]                 # [HW]
    chosen_flat = slot_pix < n_slots
    class_ix = slot_pix // (k + 1)                    # class index (0-based)

    # (slot, line) reductions — the class-level tables then come from
    # cheap [C2, K+1, L+1] table math instead of separate class-keyed
    # segment ops (one fewer 262k-update scatter at 512^2)
    seg_slot = jnp.where(chosen_flat, slot_pix * nl + lid_flat, n_slots * nl)
    nseg = n_slots * nl + 1
    bucket = jax.ops.segment_sum(
        jnp.ones_like(seg_slot), seg_slot, num_segments=nseg
    )[: n_slots * nl].reshape(c2, k + 1, nl)
    present = bucket > 0
    # distinct chosen components per line; any-overlap per (class, line)
    comp_per_line = jnp.sum(present, axis=1).at[:, 0].set(0)
    line_overlap = jnp.any(present, axis=1).at[:, 0].set(False)

    cid_min_src = jnp.where(chosen_flat & (cid_flat > 0), cid_flat, INF)
    cmin_slot = jax.ops.segment_min(
        cid_min_src, seg_slot, num_segments=nseg
    )[: n_slots * nl].reshape(c2, k + 1, nl)
    char_min = jnp.min(cmin_slot, axis=1)
    char_min = jnp.where(char_min == INF, 0, char_min).at[:, 0].set(0)
    cmax_slot = jax.ops.segment_max(
        jnp.where(chosen_flat, cid_flat, 0), seg_slot, num_segments=nseg
    )[: n_slots * nl].reshape(c2, k + 1, nl)
    char_max = jnp.max(cmax_slot, axis=1).at[:, 0].set(0)

    chosen_class = jnp.where(
        chosen_flat, class_ix + 2, 0
    ).reshape(h, w).astype(jnp.int32)

    def pad_front(x):
        pad_shape = (2,) + x.shape[1:]
        return jnp.concatenate([jnp.zeros(pad_shape, x.dtype), x], axis=0)

    return {
        "active": pad_front(sel["active"]),
        "main_bbox": pad_front(sel["main_bbox"]),
        "alt_bbox": pad_front(sel["alt_bbox"]),
        "alt_valid": pad_front(sel["alt_valid"]),
        "line_overlap": pad_front(line_overlap),
        "comp_per_line": pad_front(comp_per_line),
        "char_min": pad_front(char_min),
        "char_max": pad_front(char_max),
        "chosen_class": chosen_class,
    }


# ---------------------------------------------------------------------------
# Packing: one device->host transfer for all decode tables
# ---------------------------------------------------------------------------
# On the axon-tunneled backend each device->host fetch pays a round trip
# (~tens of ms); fetching the 8 small decode tables separately dominated
# the serve p50.  Pack them into one int32 vector on device, unpack on host.
_PACK_KEYS = (
    "active", "main_bbox", "alt_bbox", "alt_valid",
    "line_overlap", "comp_per_line", "char_min", "char_max",
)


def _pack_shapes(n_class: int, k: int, num_lines: int):
    nl = num_lines + 1
    return {
        "active": (n_class,),
        "main_bbox": (n_class, 4),
        "alt_bbox": (n_class, k, 4),
        "alt_valid": (n_class, k),
        "line_overlap": (n_class, nl),
        "comp_per_line": (n_class, nl),
        "char_min": (n_class, nl),
        "char_max": (n_class, nl),
    }


def pack_decode_out(dev: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Flatten the host-bound decode tables into one int32 vector."""
    return jnp.concatenate(
        [dev[key].astype(jnp.int32).reshape(-1) for key in _PACK_KEYS]
    )


def unpack_decode_out(
    vec: np.ndarray, n_class: int, k: int, num_lines: int
) -> Dict[str, np.ndarray]:
    shapes = _pack_shapes(n_class, k, num_lines)
    out: Dict[str, np.ndarray] = {}
    pos = 0
    for key in _PACK_KEYS:
        shape = shapes[key]
        size = int(np.prod(shape))
        out[key] = np.asarray(vec[pos : pos + size]).reshape(shape)
        pos += size
    assert pos == vec.size, (pos, vec.size)
    return out


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

    # 1-based position of each line record, for Line objects without an
    # id — a per-line ``scaled_lines.index`` is quadratic and cost ~125 ms
    # on a dense 686-line page with 10 active classes
    pos_of = {id(line): i + 1 for i, line in enumerate(scaled_lines)}

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
                lid = pos_of[id(line)]
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
        # committed reference keeps only the main component box
        # (kv_model.py:255); all_component_boxes opts into the commented
        # variant where every qualifying component box is reported
        boxes_out = field_boxes if schema.all_component_boxes else [field_boxes[-1]]
        values[c] = FieldValue(value, boxes_out, inter, union)

    return values
