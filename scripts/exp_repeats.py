"""Statistical hygiene for cross-config headline claims (VERDICT r4 #6).

Re-runs each configured benchmark invocation N times on the chip and
reports per-config median / min / max / spread, then the derived
comparisons (mixed-vs-uniform at 13B; headline). A cross-config claim is
restated only if the medians differ by more than the combined spread.

Each repetition is a fresh subprocess (fresh param build, same persistent
compile cache), so the spread includes everything the driver's run would
see except the compile itself.

Usage: python scripts/exp_repeats.py [--reps 5] [--configs headline,13b]
"""

import argparse
import json
import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "headline": [sys.executable, "bench.py"],
    "13b-uniform4": [sys.executable, "bench.py", "--model", "llama2-13b"],
    "13b-mixed2.5": [sys.executable, "scripts/exp_13b_mixed.py",
                     "--segmented"],
}


def tok_per_s(config, out):
    for line in reversed(out.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        for key in ("value", "tok_per_s", "tokens_per_s"):
            if key in rec:
                return float(rec[key])
        if "bench" in rec and "tok_per_s" in rec["bench"]:
            return float(rec["bench"]["tok_per_s"])
    m = re.findall(r"([0-9.]+) tok/s", out)
    if m:
        return float(m[-1])
    raise ValueError(f"no throughput found in {config} output:\n{out[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--configs", default="headline,13b-uniform4,13b-mixed2.5")
    args = ap.parse_args()

    results = {}
    for config in args.configs.split(","):
        cmd = CONFIGS[config]
        vals = []
        for r in range(args.reps):
            p = subprocess.run(cmd, cwd=ROOT, capture_output=True,
                               text=True, timeout=3600)
            if p.returncode != 0:
                print(f"# {config} rep{r} FAILED:\n{p.stderr[-2000:]}",
                      file=sys.stderr, flush=True)
                continue
            v = tok_per_s(config, p.stdout)
            vals.append(v)
            print(f"# {config} rep{r}: {v:.1f} tok/s", file=sys.stderr,
                  flush=True)
        med = statistics.median(vals)
        results[config] = {
            "reps": len(vals), "values": [round(v, 1) for v in vals],
            "median": round(med, 1), "min": round(min(vals), 1),
            "max": round(max(vals), 1),
            "spread_pct": round(100 * (max(vals) - min(vals)) / med, 2),
        }
        print(json.dumps({config: results[config]}), flush=True)

    if {"13b-uniform4", "13b-mixed2.5"} <= results.keys():
        u, m = results["13b-uniform4"], results["13b-mixed2.5"]
        delta = 100 * (m["median"] - u["median"]) / u["median"]
        # claim only when the median gap clears the observed ranges
        separated = (m["min"] > u["max"]) or (m["max"] < u["min"])
        results["mixed_vs_uniform_13b"] = {
            "median_delta_pct": round(delta, 2),
            "ranges_separated": separated,
            "verdict": ("mixed faster" if separated and delta > 0 else
                        "uniform faster" if separated else
                        "statistically indistinguishable (claim: matches)"),
        }
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
