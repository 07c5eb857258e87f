"""Geometric reading-order sort (top-left first).

Reproduces the selection heuristic of the reference
(inference/generic_util.py:51-92): repeatedly scan for the current
"top-left" box — a candidate displaces the incumbent if its center is more
than half a line height above, or if its center lies left of and above the
incumbent's bottom-right corner.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, TypeVar

T = TypeVar("T")


def _default_box(item):
    if isinstance(item, dict):
        return item["box"]
    return item.box


def sort_box_reading_order(items: Sequence[T], box_fn: Callable = _default_box) -> List[T]:
    boxes = list(items)
    if len(boxes) == 0:
        return boxes
    out: List[T] = []
    while len(boxes) > 1:
        top = boxes[0]
        for cand in boxes[1:]:
            tx1, ty1, tx2, ty2 = box_fn(top)
            tcx, tcy = (tx1 + tx2) / 2, (ty1 + ty2) / 2
            x1, y1, x2, y2 = box_fn(cand)
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            cell_h = y2 - y1
            if cy <= tcy - cell_h / 2:
                top = cand
                continue
            if cx < tx2 and cy < ty2:
                top = cand
                continue
        out.append(top)
        boxes.remove(top)
    out.append(boxes[0])
    return out
