#!/usr/bin/env python3
"""Dev-only harness replicating the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against the
DuckDB oracle on the same testdata directory and reports per-query
row-count / schema / value-hash matches. Not part of the engine — uses the
driver-side python stack (duckdb/pyarrow) available in this container.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # a SPARK_GRAFT_ONLY-filtered Verify writes dumped_queries.json; the
    # filter fact travels with the dump, so only queries the dump declares
    # are checked — in a full dump a missing dir means the query CRASHED
    marker = f"{out_dir}/dumped_queries.json"
    dumped = set(json.load(open(marker))) if os.path.exists(marker) else None
    # graft.Verify records per-query build/dump failures here — surface
    # the Spark-side reason instead of a bare duckdb read error
    fail_marker = f"{out_dir}/failures.json"
    spark_failures = (
        json.load(open(fail_marker)) if os.path.exists(fail_marker) else {})
    for name, sql in sorted(oracle.items()):
        if dumped is not None and name not in dumped:
            n_skip += 1
            continue
        if name in spark_failures:
            print(f"FAIL {name}: spark-side: {spark_failures[name][:200]}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
            want_rel = con.sql(sql)
            want = want_rel.fetchall()
            want_cols = [d[0] for d in want_rel.description]
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        # driver compare sorts columns by name before hashing values
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        w = [tuple(norm(r[i]) for i in wi) for r in want]
        if g != w:
            bad = next(i for i in range(len(g)) if g[i] != w[i])
            print(f"FAIL {name}: first diff row {bad}: {g[bad]} != {w[bad]}")
            n_fail += 1
            continue
        n_pass += 1
        print(f"ok   {name} ({len(got)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracled"
          + (f" ({n_skip} not in this dump)" if n_skip else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
