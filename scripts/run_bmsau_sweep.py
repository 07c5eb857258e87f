"""BMSAU quality-gap diagnosis sweep (VERDICT r4 #5).

BMSAU trails the conv configs (0.643 +- 0.113 vs NHWC 0.732) with no
recorded root cause.  Hypotheses, one knob each, one seed per cell
(seed 1, a mid-pack seed for every config), then the best cell re-run
across 3 seeds:

  base        r4 configuration (3 boxes/channel, clamp 28, adam 2e-3)
  box_lr      coordinates in PIXEL units under the conv LR -> understepped;
              decouple with --box_lr {2e-2, 2e-1}
  boxes       more rectangles per channel (5) = richer receptive fields
  box_size    larger clamp (56): fields span wider than 28 px at scale 3.0
  lr_low      global 1e-3: box convs may need gentler conv steps

Appends JSON lines to scripts/bmsau_sweep.jsonl.
Run solo on the chip:  python scripts/run_bmsau_sweep.py [--phase 1|2]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bmsau_sweep.jsonl")

CELLS = [
    ("base", []),
    ("box_lr_2e-2", ["--box_lr", "0.02"]),
    ("box_lr_2e-1", ["--box_lr", "0.2"]),
    ("boxes_5", ["--num_boxes", "5"]),
    ("box_size_56", ["--max_box_size", "56"]),
    ("lr_1e-3", ["--lr", "0.001"]),
]


def run_cell(name, extra, seed):
    t0 = time.time()
    cmd = [sys.executable, os.path.join(HERE, "synthetic_corpus_eval.py"),
           "--test_pages", "50", "--seed", str(seed),
           "--dtype", "f32", "--model", "msau_box"] + extra
    proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    line = None
    for ln in proc.stdout.splitlines():
        if ln.startswith("{") and "field F1" in ln:
            line = ln
    rec = {"cell": name, "seed": seed,
           "wall_s": round(time.time() - t0, 1)}
    if line:
        rec.update(json.loads(line))
    else:
        rec["error"] = proc.stdout[-1500:]
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"{name} seed {seed}: f1={rec.get('f1', 'ERR')} "
          f"drift={rec.get('box_drift')} ({rec['wall_s']}s)", flush=True)
    return rec


def main():
    phase = "1"
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
    if phase == "1":
        for name, extra in CELLS:
            run_cell(name, extra, seed=1)
    else:
        # phase 2: best phase-1 cell across seeds {0, 2, 3}
        best, best_f1 = None, -1.0
        for ln in open(OUT):
            r = json.loads(ln)
            if r.get("seed") == 1 and r.get("f1", -1) > best_f1:
                best, best_f1 = r["cell"], r["f1"]
        extra = dict(CELLS)[best]
        print(f"phase 2: best cell {best} (f1 {best_f1})", flush=True)
        for seed in (0, 2, 3):
            run_cell(best, extra, seed)


if __name__ == "__main__":
    main()
