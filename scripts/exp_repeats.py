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
    "headline-pers": [sys.executable, "bench.py", "--proj-kernel",
                      "persistent"],
    "13b-uniform4": [sys.executable, "bench.py", "--model", "llama2-13b"],
    "13b-mixed2.5": [sys.executable, "scripts/exp_13b_mixed.py",
                     "--segmented"],
}

# cross-config claims: claimed only when the observed ranges separate
PAIRS = [("13b-mixed2.5", "13b-uniform4", "mixed_vs_uniform_13b"),
         ("headline-pers", "headline", "persistent_vs_grid_headline")]


def tok_per_s(config, out):
    for line in reversed(out.strip().splitlines()):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        for key in ("value", "tok_per_s", "tokens_per_s", "decode_tok_s"):
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
    ap.add_argument("--configs", default=(
        "headline,headline-pers,13b-uniform4,13b-mixed2.5"))
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

    for a, b, name in PAIRS:
        if not ({a, b} <= results.keys()):
            continue
        ra, rb = results[a], results[b]
        delta = 100 * (ra["median"] - rb["median"]) / rb["median"]
        separated = (ra["min"] > rb["max"]) or (ra["max"] < rb["min"])
        results[name] = {
            "median_delta_pct": round(delta, 2),
            "ranges_separated": separated,
            "verdict": (f"{a} faster" if separated and delta > 0 else
                        f"{b} faster" if separated else
                        "statistically indistinguishable (claim: matches)"),
        }
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
