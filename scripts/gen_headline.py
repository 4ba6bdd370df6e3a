"""Single source of truth for headline numbers.

``HEADLINE.json`` (repo root) holds the current round's measured numbers
with provenance pointers into MEASUREMENTS_r*.md. This script renders
them into every doc that quotes them, between ``<!-- headline:begin -->``
/ ``<!-- headline:end -->`` markers, so a number can never drift between
README and the measurement records again (round-1 AND round-2 both
shipped stale README numbers).

Usage:
    python scripts/gen_headline.py          # rewrite docs in place
    python scripts/gen_headline.py --check  # exit 1 if any doc is stale

``tests/test_cli_and_io.py`` runs ``--check`` so drift fails the suite.
"""

import argparse
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_BEGIN = "<!-- headline:begin -->"
MARK_END = "<!-- headline:end -->"


def render(h: dict) -> str:
    d = h["decode_7b"]
    lines = [
        MARK_BEGIN,
        f"Llama-2-7B-shaped, 4-bit CALDERA (rank-128 factors), W4A8 "
        f"serving path ({d['config']}): **{d['tok_s']} tok/s at batch "
        f"{d['batch']}** ({d['ms_step']} ms/step, "
        f"{d['roofline_pct']}% of the {d['roofline_tok_s']} tok/s "
        f"HBM-bandwidth roofline"
        + (f"; {h['decode_7b_b32']['tok_s']} tok/s at batch 32"
           if "decode_7b_b32" in h else "")
        + (f"; 13B: {h['decode_13b']['tok_s']} tok/s"
           if "decode_13b" in h else "")
        + ").",
    ]
    if "decode_7b_2bit" in h:
        b2 = h["decode_7b_2bit"]
        lines.append(
            f"The 2-bit serving config (uniform-2-bit Q + int8 rank-128 "
            f"factors, ~{b2['total_bits']} TOTAL bits/param — the quality "
            f"flagship's rate regime) decodes at {b2['tok_s']} tok/s.")
    if "quality_2bit" in h:
        q = h["quality_2bit"]
        scale = q.get("scale")
        lines.append(
            f"At 2 bits the e8p lattice path holds quality end to end "
            f"through the CLI on an HF-format checkpoint"
            + (f" ({scale})" if scale else "") + ": "
            f"{q['delta_log_ppl']:+.3f} log-ppl at {q['total_bits']} "
            f"TOTAL bits/param (factors and scales included) where 2-bit "
            f"uniform RTN degrades by {q['uniform_delta_log_ppl']:+.2f}.")
    if "spec" in h:
        s = h["spec"]
        lines.append(
            f"Speculative decoding commits {s['speedup']} more tokens/s "
            f"at realistic acceptance ({s['acceptance_range']}), measured "
            f"break-even at {s['break_even']} acceptance; the serving "
            f"engine tunes gamma online and disables speculation below "
            f"break-even.")
    lines.append(f"(Round {h['round']} numbers; provenance: "
                 f"{h['provenance']}.)")
    lines.append(MARK_END)
    return "\n".join(lines)


def apply(path: str, block: str, check: bool) -> bool:
    with open(path) as f:
        text = f.read()
    pat = re.compile(re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END),
                     re.S)
    if not pat.search(text):
        print(f"{path}: no headline markers", file=sys.stderr)
        return True
    new = pat.sub(block.replace("\\", r"\\"), text)
    if new == text:
        return True
    if check:
        print(f"{path}: headline block is STALE (run "
              f"scripts/gen_headline.py)", file=sys.stderr)
        return False
    with open(path, "w") as f:
        f.write(new)
    print(f"{path}: headline block rewritten", file=sys.stderr)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    with open(os.path.join(ROOT, "HEADLINE.json")) as f:
        h = json.load(f)
    block = render(h)
    ok = True
    for doc in h["docs"]:
        ok &= apply(os.path.join(ROOT, doc), block, args.check)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
