"""VERDICT r3 #3/#5: the statistically-real accuracy table.

Runs synthetic_corpus_eval for {NHWC/f32, flat/bf16 flagship, BMSAU} x 5
model-init seeds on 40 train / 50 held-out pages (~400 fields), appending
each run's JSON line to scripts/accuracy_matrix.jsonl.

Run solo on the chip:  python scripts/run_accuracy_matrix.py [out.jsonl]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "accuracy_matrix.jsonl")
    configs = [
        ("nhwc_f32", ["--dtype", "f32", "--flat", "0"]),
        ("flat_bf16", ["--dtype", "bf16", "--flat", "2"]),
        ("bmsau_f32", ["--dtype", "f32", "--model", "msau_box"]),
        # the benched flagship KERNEL PATH (bench.py: flat_scales=3 under
        # scale_space_num=4) — VERDICT r4 missing #2: the headline config
        # needs its own trained F1 row.  S=4 so fs=3 is admissible; the
        # matrix's shared num_blocks=2 / 256^2-page protocol keeps the
        # row comparable to the others.
        ("flat3_bf16", ["--dtype", "bf16", "--flat", "3", "--scales", "4"]),
    ]
    seeds = [0, 1, 2, 3, 4]
    if "--only" in sys.argv:
        want = sys.argv[sys.argv.index("--only") + 1].split(",")
        configs = [c for c in configs if c[0] in want]
    for name, extra in configs:
        for seed in seeds:
            t0 = time.time()
            cmd = [sys.executable,
                   os.path.join(HERE, "synthetic_corpus_eval.py"),
                   "--test_pages", "50", "--seed", str(seed)] + extra
            proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, text=True)
            line = None
            for ln in proc.stdout.splitlines():
                if ln.startswith("{") and "field F1" in ln:
                    line = ln
            rec = {"config": name, "seed": seed,
                   "wall_s": round(time.time() - t0, 1)}
            if line:
                rec.update(json.loads(line))
            else:
                rec["error"] = proc.stdout[-2000:]
            with open(out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"{name} seed {seed}: "
                  f"{rec.get('f1', 'ERR')} ({rec['wall_s']}s)", flush=True)


if __name__ == "__main__":
    main()
