"""Summarize a jax.profiler trace: device op time by family and by module.

Usage:
  python scripts/trace_summary.py [trace_dir] [n_steps] [hlo_dump.txt]

trace_dir defaults to /tmp/flagship_trace (written by
scripts/profile_flagship.py --trace); n_steps to 3.  With an HLO text
dump (jit(...).lower(...).compile().as_text()) as the third argument,
also attributes op time to model modules via op_name metadata.
"""

import collections
import glob
import gzip
import json
import re
import sys


def load_device_events(trace_dir: str):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    proc = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
    dev = {p for p, n in proc.items()
           if "TPU" in n or "/device" in n.lower()}
    out = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        name = e.get("name", "?")
        # skip umbrella events (jit_step envelope, bare step-number lanes)
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        out[name] += e.get("dur", 0.0)
    return out


def by_family(agg, n_steps, top=25):
    fam = collections.Counter()
    for name, us in agg.items():
        fam[re.sub(r"[.\d]+$", "", name)] += us
    total = sum(fam.values())
    print(f"device op self-time: {total/1e3/n_steps:.1f} ms/step")
    for k, v in fam.most_common(top):
        print(f"{v/1e3/n_steps:9.2f} ms  {k}")


def by_module(agg, hlo_path, n_steps, top=30):
    hlo = open(hlo_path).read()
    meta = {}
    for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*?metadata={[^}]*op_name=\"([^\"]+)\"",
            hlo):
        meta[m.group(1)] = m.group(2)
    bycomp = collections.Counter()
    unmapped = collections.Counter()
    for name, us in agg.items():
        key = meta.get(name) or meta.get(name.replace("-", "."))
        if key is None:
            unmapped[name] += us
            continue
        parts = key.split("/")
        comp = None
        for i, p in enumerate(parts):
            if p in ("down", "up") and i + 1 < len(parts):
                comp = parts[i + 1]
                break
        if comp is None:
            comp = "/".join(parts[2:5])
        fwd = "transpose" not in key
        bycomp[("fwd" if fwd else "bwd", comp)] += us
    print("\nby module (ms/step):")
    for k, v in bycomp.most_common(top):
        print(f"{v/1e3/n_steps:9.2f}  {k}")
    print("unmapped:")
    for k, v in unmapped.most_common(10):
        print(f"{v/1e3/n_steps:9.2f}  {k}")


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    agg = load_device_events(trace_dir)
    by_family(agg, n_steps)
    if len(sys.argv) > 3:
        by_module(agg, sys.argv[3], n_steps)


if __name__ == "__main__":
    main()
