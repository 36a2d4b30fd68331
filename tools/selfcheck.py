#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each query's parquet dump (written by graft.Verify), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the
sfDir tables, canonicalizes both (columns sorted by name, rows sorted
by all columns), and diffs values exactly.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    """Run rel_sql, project columns sorted by name, sort rows, fetch."""
    cols = [d[0] for d in con.sql(rel_sql).description]
    ordered = ", ".join(f'"{c}"' for c in sorted(cols))
    rows = con.sql(
        f"SELECT {ordered} FROM ({rel_sql}) ORDER BY ALL"
    ).fetchall()
    return sorted(cols), rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            ocols, orows = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            scols, srows = canon(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ: spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; "
                  f"first at {i}:\n  spark : {a}\n  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
