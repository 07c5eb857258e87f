"""Tracing / profiling / metrics logging (SURVEY.md §5.1, §5.5).

The reference has only wall-clock prints (trainer.py:99,148) and optional
TensorBoardX scalars.  Here:

* ``StepTimer`` — wall-clock + EMA step timing with device-sync option
  (an actual device->host transfer; see bench.py note on the axon backend).
* ``trace`` — context manager around ``jax.profiler`` trace annotations;
  ``start_server`` exposes the live profiler.
* ``MetricsLogger`` — JSONL scalar logging (always available) with
  optional TensorBoard event writing when a writer lib is importable.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on: Any = None) -> float:
        """Returns the step seconds; pass an output array as ``sync_on`` to
        force real completion via a device->host fetch."""
        if sync_on is not None:
            leaf = jax.tree_util.tree_leaves(sync_on)[0]
            np.asarray(leaf).ravel()[:1]
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt


@contextlib.contextmanager
def trace(name: str, **kwargs):
    """jax.profiler.TraceAnnotation wrapper (no-op on failure)."""
    try:
        with jax.profiler.TraceAnnotation(name, **kwargs):
            yield
    except Exception:
        yield


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a profiler trace directory viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """JSONL scalars + optional TensorBoard events."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:  # pragma: no cover - optional dep
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        row = {"step": int(step)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in row.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def log_image(self, step: int, name: str, image) -> Optional[str]:
        """Write an image (numpy HxW[xC] or PIL) as PNG under log_dir —
        the io_utils.log_matrix TensorBoard-image analog."""
        try:
            from PIL import Image

            if not hasattr(image, "save"):
                arr = np.asarray(image)
                if arr.dtype != np.uint8:
                    lo, hi = float(arr.min()), float(arr.max())
                    arr = ((arr - lo) / (hi - lo + 1e-9) * 255).astype(np.uint8)
                image = Image.fromarray(arr)
            path = os.path.join(
                os.path.dirname(self._f.name), f"{name.replace('/', '_')}_{step}.png"
            )
            image.save(path)
            return path
        except Exception:
            return None

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
