"""Profiling / metrics-logger tests."""

import json
import os
import time

import numpy as np

from msau_tpu.utils.profiling import MetricsLogger, StepTimer, trace


class TestStepTimer:
    def test_timing_and_ema(self):
        t = StepTimer(ema=0.5)
        t.start()
        time.sleep(0.01)
        dt = t.stop()
        assert dt >= 0.01
        assert t.avg == dt
        t.start()
        dt2 = t.stop()
        assert t.avg == 0.5 * dt + 0.5 * dt2


class TestMetricsLogger:
    def test_jsonl_rows(self, tmp_path):
        with MetricsLogger(str(tmp_path), tensorboard=False) as ml:
            ml.log(1, {"loss": 0.5, "acc": np.float32(0.25), "skip": "str"})
            ml.log(2, {"loss": 0.4})
        rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
        assert rows[0] == {"step": 1, "loss": 0.5, "acc": 0.25}
        assert rows[1]["step"] == 2

    def test_log_image(self, tmp_path):
        with MetricsLogger(str(tmp_path), tensorboard=False) as ml:
            p = ml.log_image(3, "pred/map", np.random.rand(16, 16))
        assert p and os.path.exists(p)


class TestTrace:
    def test_trace_noop(self):
        with trace("step"):
            pass  # must not raise
