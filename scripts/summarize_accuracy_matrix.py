"""Aggregate scripts/accuracy_matrix.jsonl into the PERF.md F1 table:
mean +- sd and a normal-approx 95% CI per config, field-level and
per-pixel."""

import json
import math
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scripts/accuracy_matrix.jsonl"
    rows = [json.loads(l) for l in open(path)]
    by = {}
    for r in rows:
        if "f1" in r:
            by.setdefault(r["config"], []).append(r)
    for cfg, rs in by.items():
        f1 = [r["f1"] for r in rs]
        pp = [r.get("pixel_precision", float("nan")) for r in rs]
        pr = [r.get("pixel_recall", float("nan")) for r in rs]
        n = len(f1)
        mean = sum(f1) / n
        sd = math.sqrt(sum((v - mean) ** 2 for v in f1) / max(n - 1, 1))
        ci = 1.96 * sd / math.sqrt(n)
        drift = [r["box_drift"] for r in rs if "box_drift" in r]
        extra = (f"  box_drift {sum(drift)/len(drift):.4f}" if drift else "")
        print(f"{cfg:10s} n={n}  F1 {mean:.3f} +- {sd:.3f} "
              f"(95% CI +-{ci:.3f})  seeds {sorted(round(v,3) for v in f1)}  "
              f"pixP {sum(pp)/n:.3f} pixR {sum(pr)/n:.3f}{extra}")


if __name__ == "__main__":
    main()
