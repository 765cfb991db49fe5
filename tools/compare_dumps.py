#!/usr/bin/env python3
"""Dev-only determinism check: two graft.Verify dumps must be
VALUE-identical query by query (bit-level on doubles — compared via
exact value equality, not rounded strings). Catches nondeterministic
accumulation orders, rand() leaks, and partition-dependent results.

Usage: python3 tools/compare_dumps.py <dumpDirA> <dumpDirB>
"""
import json
import os
import sys

import duckdb


def main(a, b):
    oracle = json.load(open(f"{a}/oracle_sql.json"))
    con = duckdb.connect()
    n_same = n_diff = n_skip = 0
    for name in sorted(oracle):
        if not (os.path.isdir(f"{a}/{name}") and os.path.isdir(f"{b}/{name}")):
            n_skip += 1
            continue
        def norm(rows):
            # repr is round-trippable for doubles (bit-level compare) and
            # collapses NaN to a comparable token (NaN != NaN otherwise)
            return [tuple(repr(v) for v in r) for r in rows]
        ra = norm(con.sql(f"SELECT * FROM '{a}/{name}/*.parquet'").fetchall())
        rb = norm(con.sql(f"SELECT * FROM '{b}/{name}/*.parquet'").fetchall())
        if ra == rb:
            n_same += 1
        else:
            n_diff += 1
            bad = next((i for i in range(min(len(ra), len(rb)))
                        if ra[i] != rb[i]), None)
            print(f"DIFF {name}: rows {len(ra)} vs {len(rb)}, "
                  f"first diff {bad}: "
                  f"{ra[bad] if bad is not None else ''} != "
                  f"{rb[bad] if bad is not None else ''}")
    print(f"{n_same} identical, {n_diff} differ, {n_skip} skipped")
    return 1 if n_diff else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
