"""Checkpoint naming, rich checkpoints, CSV reports, file listing.

Covers the reference's utils/io_utils.py (naming scheme :37-80, rich
checkpoint dict :83-128), utils/path_util.py:3-24 (image list reader) and
inference/generic_util.py:250-289 (CSV report writers) — with orbax as the
storage backend instead of torch.save, plus a JSON sidecar for metadata.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np


# ---------------------------------------------------------------------------
# checkpoint naming (io_utils.py:37-80 scheme)
# ---------------------------------------------------------------------------
def gen_prefix(dataset: str, method: str, hidden_dim: int, output_dim: int,
               name: Optional[str] = None) -> str:
    parts = [dataset]
    if name:
        parts.append(name)
    parts.append(method)
    parts.append(f"h{hidden_dim}_o{output_dim}")
    return "_".join(parts)


def create_filename(ckptdir: str, prefix: str, epoch: Optional[int] = None) -> str:
    d = os.path.join(ckptdir, prefix)
    os.makedirs(d, exist_ok=True)
    name = str(epoch) if epoch is not None else "best"
    return os.path.join(d, name)


# ---------------------------------------------------------------------------
# rich checkpoints: train state + config + predictions metadata
# ---------------------------------------------------------------------------
def save_checkpoint(
    path: str,
    state,
    config: Optional[Dict[str, Any]] = None,
    cg_dict: Optional[Dict[str, Any]] = None,
    epoch: int = -1,
) -> None:
    """Full checkpoint: orbax train state + JSON sidecar (epoch, config) +
    optional npz of auxiliary arrays (reference cg_dict, io_utils.py:83-105)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": epoch, "config": config or {}}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    if cg_dict:
        np.savez_compressed(
            path + ".cg.npz",
            **{k: np.asarray(v) for k, v in cg_dict.items() if v is not None},
        )


def load_checkpoint(path: str, state_template):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, state_template)
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta


# ---------------------------------------------------------------------------
# list/reporting helpers
# ---------------------------------------------------------------------------
def read_image_list(path: str, prefix: Optional[str] = None) -> List[str]:
    """One path per line; optional prefix join (path_util.py:3-24)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append(os.path.join(prefix, line) if prefix else line)
    return out


def glob_folder(path: str, extension: str, use_dirname: bool = False) -> Dict[str, str]:
    """Recursive basename -> path map (scripts/data_util.py:8-23)."""
    file_map: Dict[str, str] = {}
    for dirpath, _, filenames in os.walk(path):
        for fn in filenames:
            if fn.endswith(extension):
                base = (
                    os.path.basename(dirpath)
                    if use_dirname
                    else os.path.basename(fn).split(".")[0]
                )
                file_map.setdefault(base, os.path.join(dirpath, fn))
    return file_map


def write_csv_report_by_row(
    out_path: str,
    file_list: Sequence[str],
    kv_results: Sequence[Dict[str, str]],
) -> None:
    """Per-file rows, field columns (generic_util.py:250-270 equivalent)."""
    fields = sorted({k for r in kv_results for k in r})
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file"] + fields)
        for path, result in zip(file_list, kv_results):
            w.writerow([os.path.basename(path)] + [result.get(k, "") for k in fields])


def write_csv_report_by_field(
    out_path: str,
    file_list: Sequence[str],
    kv_results: Sequence[Dict[str, str]],
) -> None:
    """Field-major listing (generic_util.py:272-289 equivalent)."""
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["field", "file", "value"])
        for path, result in zip(file_list, kv_results):
            for k in sorted(result):
                w.writerow([k, os.path.basename(path), result[k]])
