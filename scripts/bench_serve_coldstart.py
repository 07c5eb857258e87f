"""Serve cold-start (VERDICT r3 #8): first-request latency of the fused
serve program with and without the persistent compile cache, and the
effect of KVModel.load(warmup=...).

Each phase runs in a fresh subprocess (jit caches are per-process):
  1. cold + empty persistent cache dir
  2. cold + warm persistent cache (second process)
  3. load(warmup=512) then first request (steady-state from request 1)

Run solo on the chip:  python scripts/bench_serve_coldstart.py
"""

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r'''
import json, os, sys, time
sys.path.insert(0, r"%(root)s")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from msau_tpu.config import InferConfig, ModelConfig
from msau_tpu.data.charset import Charset
from msau_tpu.data.pages import page_from_label_dict
from msau_tpu.data.synth import BENCH_CHARSET, make_page
from msau_tpu.infer.kv_model import KVModel
from msau_tpu.models.msau import build_model

cfg = ModelConfig(img_channels=64, n_class=17, scale_space_num=4,
                  res_depth=2, feat_root=8, num_blocks=3,
                  final_act="softmax", dtype="bfloat16", flat_scales=3)
kv = KVModel(model_config=cfg)
kv.charset = Charset(chars=" $" + BENCH_CHARSET)
kv.model = build_model(cfg)
kv.params = kv.model.init(jax.random.PRNGKey(0),
                          np.zeros((1, 64, 64, 64), np.float32))
page = page_from_label_dict(
    make_page(np.random.default_rng(3), n_cols=5, rows_per_col=10))

do_warm = os.environ.get("WARMUP") == "1"
t0 = time.perf_counter()
if do_warm:
    kv.warmup_bucket(512)
t_warm = time.perf_counter() - t0

t0 = time.perf_counter()
kv.predict(page)
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
kv.predict(page)
t_second = time.perf_counter() - t0
print(json.dumps({"warmup_s": round(t_warm, 2),
                  "first_request_s": round(t_first, 2),
                  "second_request_s": round(t_second, 3)}))
'''


def run(cache_dir, warmup):
    env = dict(os.environ, CACHE_DIR=cache_dir,
               WARMUP="1" if warmup else "0")
    proc = subprocess.run([sys.executable, "-c", CHILD % {"root": os.path.dirname(HERE)}],
                          env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    for ln in proc.stdout.splitlines():
        if ln.startswith("{"):
            return json.loads(ln)
    raise SystemExit(proc.stdout[-2000:])


def main():
    fresh = tempfile.mkdtemp(prefix="serve_cache_")
    r1 = run(fresh, warmup=False)
    print("cold process, EMPTY persistent cache :", r1)
    r2 = run(fresh, warmup=False)
    print("cold process, warm persistent cache  :", r2)
    r3 = run(fresh, warmup=True)
    print("cold process, load(warmup=512)       :", r3)


if __name__ == "__main__":
    main()
