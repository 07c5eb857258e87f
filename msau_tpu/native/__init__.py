"""ctypes binding for the native rasterizer core, with numpy fallback.

``char_records(...)`` is the single entry point the data layer uses; it
dispatches to librasterlib.so when present (build with
``python msau_tpu/native/build.py``) and otherwise to a vectorized numpy
implementation with identical semantics.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "librasterlib.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        # try to build on the fly if a compiler is around; stay silent on
        # failure — the numpy fallback is always available
        try:
            from msau_tpu.native.build import build

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.build_char_records.restype = ctypes.c_int64
    lib.build_char_records.argtypes = [
        ctypes.c_int64, i32p, i32p, i32p, ctypes.c_double, i32p, i32p, i32p,
    ]
    lib.build_wordgrid_records.restype = ctypes.c_int64
    lib.build_wordgrid_records.argtypes = [
        ctypes.c_int64, f64p, i32p, i32p,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        i32p,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def char_records(
    line_boxes: np.ndarray,      # [L, 4] int32 scaled (x1, y1, x2, y2)
    text_offsets: np.ndarray,    # [L+1] int32
    char_ids: np.ndarray,        # [total] int32
    char_w_cap_factor: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (records [N,5] (y1,y2,sx,ex,id), line_idx [N] 1-based, char_pos [N])."""
    lib = _load()
    total = int(char_ids.shape[0])
    line_boxes = np.ascontiguousarray(line_boxes, np.int32)
    text_offsets = np.ascontiguousarray(text_offsets, np.int32)
    char_ids = np.ascontiguousarray(char_ids, np.int32)
    if lib is not None:
        out = np.empty((total, 5), np.int32)
        li = np.empty(total, np.int32)
        cp = np.empty(total, np.int32)
        n = lib.build_char_records(
            len(line_boxes), line_boxes.reshape(-1), text_offsets, char_ids,
            float(char_w_cap_factor), out.reshape(-1), li, cp,
        )
        return out[:n], li[:n], cp[:n]
    return _char_records_numpy(line_boxes, text_offsets, char_ids, char_w_cap_factor)


def _char_records_numpy(line_boxes, text_offsets, char_ids, cap_factor):
    lens = np.diff(text_offsets)
    keep = lens > 0
    if not keep.any():
        e = np.zeros((0,), np.int32)
        return np.zeros((0, 5), np.int32), e, e
    x1, y1, x2, y2 = line_boxes[:, 0], line_boxes[:, 1], line_boxes[:, 2], line_boxes[:, 3]
    lens_f = np.maximum(lens, 1).astype(np.float64)
    cfw = np.maximum((x2 - x1) / lens_f, 1.0)
    cw = np.maximum(0.9 * cfw, 1.0)
    cw = np.minimum(cw, ((y2 - y1) * cap_factor).astype(np.int64).astype(np.float64))
    line_of = np.repeat(np.arange(len(lens)), lens)          # [N]
    pos = np.arange(len(char_ids)) - np.repeat(text_offsets[:-1], lens)
    offset = x1[line_of] + pos * cfw[line_of]
    sx = offset.astype(np.int32)
    ex = (offset + cw[line_of]).astype(np.int32)
    rec = np.stack(
        [y1[line_of], y2[line_of], sx, ex, char_ids], axis=1
    ).astype(np.int32)
    return rec, (line_of + 1).astype(np.int32), (pos + 1).astype(np.int32)


def wordgrid_records(
    word_boxes: np.ndarray,     # [W, 4] float64 (x, y, w, h)
    text_offsets: np.ndarray,
    char_ids: np.ndarray,
    min_x: float, min_y: float, min_scale: float, min_h: float,
) -> np.ndarray:
    lib = _load()
    word_boxes = np.ascontiguousarray(word_boxes, np.float64)
    text_offsets = np.ascontiguousarray(text_offsets, np.int32)
    char_ids = np.ascontiguousarray(char_ids, np.int32)
    total = int(char_ids.shape[0])
    if lib is not None:
        out = np.empty((total, 5), np.int32)
        n = lib.build_wordgrid_records(
            len(word_boxes), word_boxes.reshape(-1), text_offsets, char_ids,
            float(min_x), float(min_y), float(min_scale), float(min_h),
            out.reshape(-1),
        )
        return out[:n]
    # numpy fallback
    lens = np.diff(text_offsets)
    x, y, w, h = word_boxes.T
    nx = ((x - min_x) / min_scale).astype(np.int64)
    ny = ((y - min_y) / min_h).astype(np.int64)
    nw = np.maximum((w / min_scale).astype(np.int64), 1)
    nh = np.maximum((h / min_h).astype(np.int64), 1)
    pcw = np.maximum(nw // np.maximum(lens, 1), 1)
    word_of = np.repeat(np.arange(len(lens)), lens)
    pos = np.arange(len(char_ids)) - np.repeat(text_offsets[:-1], lens)
    sx = nx[word_of] + pcw[word_of] * pos
    rec = np.stack(
        [ny[word_of], ny[word_of] + nh[word_of], sx, sx + pcw[word_of], char_ids],
        axis=1,
    ).astype(np.int32)
    return rec
