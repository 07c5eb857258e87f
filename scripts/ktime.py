"""Device-side kernel timing via jax.profiler traces.

Host-side timing through the axon tunnel is unreliable: block_until_ready
can return before the remote chain executes, and a synced call pays ~25 ms
RTT (PERF.md pitfalls).  The profiler trace records per-kernel device
durations, immune to both.

    from ktime import device_ms
    ms = device_ms(jitted_fn, *args, iters=20)   # total device ms / iters

The fn is invoked once per iter inside one trace; returns summed device
op self-time divided by iters.  Events named jit_*/bare step numbers are
umbrella lanes and skipped (same rule as trace_summary.py).
"""

import collections
import glob
import gzip
import json
import os
import re
import shutil
import tempfile


def _device_total_us(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise RuntimeError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    proc = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
    dev = {p for p, n in proc.items() if "TPU" in n or "/device" in n.lower()}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        total += e.get("dur", 0.0)
    return total


def device_ms(fn, *args, iters=10, warmup=2):
    """Total device op time per invocation of fn(*args), in ms."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    d = tempfile.mkdtemp(prefix="ktime_")
    try:
        with jax.profiler.trace(d):
            r = None
            for _ in range(iters):
                r = fn(*args)
            jax.block_until_ready(r)
            # hard sync: a real device->host transfer
            _ = jax.device_get(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        return _device_total_us(d) / 1e3 / iters
    finally:
        shutil.rmtree(d, ignore_errors=True)


def device_families_ms(fn, *args, iters=10, warmup=2, top=15):
    """Like device_ms but returns (total_ms, Counter of family -> ms)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    d = tempfile.mkdtemp(prefix="ktime_")
    try:
        with jax.profiler.trace(d):
            r = None
            for _ in range(iters):
                r = fn(*args)
            jax.block_until_ready(r)
            _ = jax.device_get(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
        paths = glob.glob(f"{d}/**/*.trace.json.gz", recursive=True)
        with gzip.open(sorted(paths)[-1], "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        proc = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
        dev = {p for p, n in proc.items()
               if "TPU" in n or "/device" in n.lower()}
        fam = collections.Counter()
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in dev:
                continue
            name = e.get("name", "?")
            if name.startswith("jit_") or re.fullmatch(r"\d+", name):
                continue
            fam[re.sub(r"[.\d]+$", "", name)] += e.get("dur", 0.0)
        total = sum(fam.values()) / 1e3 / iters
        fam_ms = collections.Counter(
            {k: v / 1e3 / iters for k, v in fam.items()})
        return total, fam_ms
    finally:
        shutil.rmtree(d, ignore_errors=True)
