#!/usr/bin/env python3
"""Self-adjudicating driver-bench report (VERDICT r14 'What's missing' #4).

Compares a driver bench artifact (BENCH_r{N}.json, per-query rows inside
its `tail` capture) against a same-surface local artifact
(BENCH_r{N}_local.json or target/bench_result.json, `queries_median`
maps) and lists every row whose driver median exceeds RATIO x the local
median -- the rows that need SentinelCheck adjudication before the
driver artifact can be called clean. The r12-r15 protocol is
adjudicate-then-exonerate: a flagged row is not an accusation, it is a
work item (fresh-JVM SentinelCheck repeat-5, then either a fix or an
on-the-record box exoneration in BASELINE.md).

Usage: bench_adjudicate.py DRIVER.json LOCAL.json [--ratio 3.0] [--fail]
  --fail  exit 1 when any row is flagged (for use as a gate)
"""
import json
import re
import sys


def rows_of(path):
    """{name: (headline, min, median, max)} from either artifact shape."""
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc, dict) and "queries_median" in doc:
        qs, mn, md, mx = (doc.get(k, {}) for k in
                          ("queries", "queries_min", "queries_median", "queries_max"))
        return {q: (qs.get(q), mn.get(q), md[q], mx.get(q)) for q in md}
    # driver shape: per-query JSON lines live (escaped) inside `tail`
    text = json.dumps(doc) if isinstance(doc, dict) else str(doc)
    text = text.replace('\\"', '"')
    out = {}
    for m in re.finditer(
            r'\{"q":"([A-Za-z0-9_]+)","s":(-?[0-9.]+),"mn":(-?[0-9.]+),'
            r'"md":(-?[0-9.]+),"mx":(-?[0-9.]+)', text):
        out[m.group(1)] = tuple(float(m.group(i)) for i in (2, 3, 4, 5))
    return out


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    if len(args) < 2:
        print(__doc__)
        return 2
    ratio = 3.0
    for a in argv:
        if a.startswith("--ratio"):
            ratio = float(a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1])
    driver, local = rows_of(args[0]), rows_of(args[1])
    flagged = []
    for q in sorted(set(driver) & set(local)):
        d_s, d_mn, d_md, d_mx = driver[q]
        l_md = local[q][2]
        if l_md and l_md > 0 and d_md > ratio * l_md:
            # driver-min near local-median is the box-noise signature
            # (the work is fast when the box lets it run)
            hint = ("box-noise-signature" if d_mn is not None and d_mn < ratio * l_md
                    else "investigate")
            flagged.append((q, d_md, l_md, d_md / l_md, d_mn, d_mx, hint))
    print(f"driver={args[0]} local={args[1]} ratio>{ratio:.1f}x "
          f"shared_rows={len(set(driver) & set(local))}")
    if not flagged:
        print("no rows flagged -- driver artifact is self-consistent with local")
        return 0
    print("\n| query | driver md | local md | ratio | driver mn | driver mx | hint |")
    print("|---|---|---|---|---|---|---|")
    for q, dmd, lmd, r, dmn, dmx, hint in sorted(flagged, key=lambda x: -x[3]):
        mn = f"{dmn:.2f}" if dmn is not None else "n/a"
        mx = f"{dmx:.2f}" if dmx is not None else "n/a"
        print(f"| {q} | {dmd:.2f} | {lmd:.2f} | {r:.1f}x | {mn} | {mx} | {hint} |")
    print(f"\n{len(flagged)} row(s) need SentinelCheck adjudication "
          f"(Test/runMain graft.tools.SentinelCheck "
          f"{','.join(q for q, *_ in flagged)} {args[0]})")
    return 1 if "--fail" in argv else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
