#!/usr/bin/env python3
"""Ledger-vs-artifact reconciliation (VERDICT r14 'What's wrong' #2).

ROUND14.md quoted per-row bench numbers that didn't match the committed
final artifact (hand-typed from a superseded run). This checker makes
that class of error fail loudly: every `<query-ish name> ... <N.N> s`
mention in a round ledger whose name resolves to a bench-artifact query
must quote a number that matches one of that row's recorded stats
(headline/min/median/max, at the quoted precision).

Name resolution is deliberately permissive about prefixes (ledgers
write `semdecontam` for `d_curation_semdecontam`): a mention matches a
query when it equals the full name or a unique `_`-boundary suffix.
Unresolvable names are skipped (they are prose, not quotes).

Usage: ledger_check.py ROUND{N}.md BENCH_local.json
Exit 1 with a mismatch list when any quoted number is absent from the
artifact; also prints the generated quote line for each queried row so
the fix is copy-paste.
"""
import json
import re
import sys


def main(argv):
    if len(argv) != 2:
        print(__doc__)
        return 2
    ledger_path, artifact_path = argv
    with open(artifact_path) as f:
        doc = json.load(f)
    stats = {}
    for key in ("queries", "queries_min", "queries_median", "queries_max"):
        for q, v in doc.get(key, {}).items():
            stats.setdefault(q, set()).add(float(v))
    names = sorted(stats)

    def resolve(word):
        """All artifact queries a mention could denote: the full name,
        or every `_`-boundary-suffix match (an ambiguous mention passes
        when ANY candidate recorded the number -- attribution may be
        loose, but a number no candidate recorded is a misquote)."""
        if word in stats:
            return [word]
        return [n for n in names if n.endswith("_" + word)]

    with open(ledger_path) as f:
        text = f.read()
    mismatches = []
    checked = 0

    def check(word, num):
        nonlocal checked
        qs = resolve(word)
        if not qs:
            return
        checked += 1
        val, dec = float(num), len(num.split(".")[1])
        if not any(abs(round(s, dec) - val) < 1e-9
                   for q in qs for s in stats[q]):
            mismatches.append((word, "/".join(qs), num))

    # style A: "<name> 9.29 s" -- a directly-united quote; every number
    # between the name and the unit must be in the artifact
    for m in re.finditer(
            r"\b([a-z][a-z0-9_]{3,})\b((?:[^a-z_\n][^a-z\n]*?\d+\.\d+)+)\s*s\b", text):
        for num in re.findall(r"\d+\.\d+", m.group(2)):
            check(m.group(1), num)
    # style B: "<name> 11.3 -> 6.9" -- the RIGHT side claims this
    # round's artifact (the left is the previous round's); a `~` marks a
    # declared approximation and is exempt
    for m in re.finditer(
            r"\b([a-z][a-z0-9_]{3,})\b\s+\d+\.\d+(?:-\d+\.\d+)?\s*(?:→|->)\s*"
            r"(~?)(\d+\.\d+)", text):
        if not m.group(2):
            check(m.group(1), m.group(3))
    print(f"checked {checked} quoted number(s) against {artifact_path}")
    if not mismatches:
        print("ledger quotes reconcile with the artifact")
        return 0
    for word, q, num in mismatches:
        have = ", ".join(f"{v:.2f}" for part in q.split("/")
                         for v in sorted(stats[part]))
        print(f"MISMATCH: '{word} ... {num} s' -- {q} recorded [{have}]")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
