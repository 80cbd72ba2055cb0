"""Score the espeak-free fallback G2P against the bundled CMUdict sample.

Prints word accuracy (with / without stress) and phone error rate, split by
lexicon hits vs rule-engine words. The same numbers are pinned by
tests/test_text_g2p.py::test_g2p_accuracy_vs_cmudict_sample and quoted in
docs/PARITY.md.

Usage: python scripts/g2p_eval.py [--verbose]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torch_tts_tpu.text.g2p import LEXICON, word_to_arpabet  # noqa: E402

SAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "cmudict_sample.txt",
)


def strip_stress(phones):
    return [re.sub(r"\d", "", p) for p in phones]


def edit_distance(a, b):
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            cur = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[len(b)]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--verbose", action="store_true", help="print mismatches")
    args = p.parse_args()

    rows = []
    with open(SAMPLE) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            w, gold = line.rstrip("\n").split("\t")
            rows.append((w, gold.split()))

    print(f"{'subset':8s} {'n':>4s} {'word-acc':>9s} {'no-stress':>10s} {'PER':>6s}")
    for subset in ("all", "lexicon", "rules"):
        sel = [
            (w, g) for w, g in rows
            if subset == "all" or (subset == "lexicon") == (w in LEXICON)
        ]
        exact = exact_ns = per_num = per_den = 0
        for w, g in sel:
            pred = word_to_arpabet(w)
            exact += pred == g
            exact_ns += strip_stress(pred) == strip_stress(g)
            per_num += edit_distance(strip_stress(pred), strip_stress(g))
            per_den += len(g)
            if args.verbose and subset == "all" and pred != g:
                kind = "LEX " if w in LEXICON else "RULE"
                print(f"  {kind} {w:14s} gold={' '.join(g):30s} "
                      f"pred={' '.join(pred)}")
        print(f"{subset:8s} {len(sel):4d} {exact/len(sel):9.3f} "
              f"{exact_ns/len(sel):10.3f} {per_num/per_den:6.3f}")


if __name__ == "__main__":
    main()
