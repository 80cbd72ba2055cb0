"""Alphabet auditor (equivalent of /root/reference/tools/helper.py):
Unicode-category census and rare-character report for transcripts — used to
design an alphabet/char_map for a new dataset."""

from __future__ import annotations

import unicodedata
from collections import Counter
from typing import Dict, Iterable


def audit_alphabet(lines: Iterable[str], rare_threshold: int = 2) -> Dict:
    counts: Counter = Counter()
    categories: Counter = Counter()
    for line in lines:
        for ch in line:
            counts[ch] += 1
            categories[unicodedata.category(ch)] += 1
    rare = {c: n for c, n in counts.items() if n <= rare_threshold}
    return {
        "counts": dict(counts),
        "categories": dict(categories),
        "rare": rare,
        "alphabet": "".join(sorted(counts)),
    }


def main():
    import argparse
    import sys

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("transcript", help="text file (one utterance per line)")
    p.add_argument("--column", type=int, default=None,
                   help="pipe-separated column to audit")
    args = p.parse_args()

    def lines():
        with open(args.transcript, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if args.column is not None:
                    parts = line.split("|")
                    if len(parts) > args.column:
                        yield parts[args.column]
                else:
                    yield line

    report = audit_alphabet(lines())
    print("alphabet:", repr(report["alphabet"]))
    print("categories:", report["categories"])
    if report["rare"]:
        print("rare characters:")
        for c, n in sorted(report["rare"].items(), key=lambda kv: kv[1]):
            print(f"  {c!r} ({unicodedata.name(c, '?')}): {n}")


if __name__ == "__main__":
    main()
