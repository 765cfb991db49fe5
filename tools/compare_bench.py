#!/usr/bin/env python3
"""Cross-round bench comparison over the committed bench_full_r*.json
captures (dev-only tooling, mirrors the judge's per-query diff).

Usage: python3 tools/compare_bench.py OLD.json NEW.json [--top N]

Prints totals, the median per-query ratio, the biggest absolute moves in
both directions, and new/removed queries. When both captures carry a
"runs" field (round 12+ best-of-2), also reports each side's in-capture
spread so host noise is visible next to the deltas.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def spread(cap):
    runs = cap.get("runs") or {}
    rel = [max(v) / min(v) for v in runs.values()
           if isinstance(v, list) and len(v) > 1 and min(v) > 0]
    return statistics.median(rel) if rel else None


def main():
    # consume --top together with its VALUE so the number never leaks
    # into the positional capture paths (load("8") would crash)
    argv = sys.argv[1:]
    top = 8
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--top":
            if i + 1 >= len(argv):
                sys.exit("--top needs a value (usage: --top N)")
            try:
                top = int(argv[i + 1])
            except ValueError:
                sys.exit(f"--top needs an integer, got {argv[i + 1]!r}")
            i += 2
        elif argv[i].startswith("--"):
            i += 1
        else:
            args.append(argv[i])
            i += 1
    old, new = load(args[0]), load(args[1])
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    print(f"old: {len(qo)} queries, {old['value']:.1f} s "
          f"({old['value']/len(qo):.3f} s/q)  [{args[0]}]")
    print(f"new: {len(qn)} queries, {new['value']:.1f} s "
          f"({new['value']/len(qn):.3f} s/q)  [{args[1]}]")
    for name, cap in (("old", old), ("new", new)):
        s = spread(cap)
        if s is not None:
            print(f"{name} in-capture run spread (median max/min): {s:.2f}")
    if common:
        ratios = [qn[k] / qo[k] for k in common if qo[k] > 0]
        print(f"median ratio new/old over {len(common)} common: "
              f"{statistics.median(ratios):.3f}")
        by_delta = sorted(common, key=lambda k: qn[k] - qo[k])
        print("\nbiggest regressions (new - old):")
        for k in by_delta[-top:][::-1]:
            print(f"  {k:30s} {qo[k]:7.2f} -> {qn[k]:7.2f}  ({qn[k]-qo[k]:+.2f})")
        print("biggest improvements:")
        for k in by_delta[:top]:
            print(f"  {k:30s} {qo[k]:7.2f} -> {qn[k]:7.2f}  ({qn[k]-qo[k]:+.2f})")
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print("\nnew queries:", ", ".join(f"{k} ({qn[k]:.2f}s)" for k in added))
    if removed:
        print("removed queries:", ", ".join(removed))
    if new.get("failed"):
        print("FAILED in new capture:", new["failed"])


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closing early is not an error
        import os
        os._exit(0)
