#!/usr/bin/env python3
"""Static dtype audit of every oracle SQL statement.

Usage: python3 tools/audit_oracle_types.py <sfDir> <outDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify) and runs
`DESCRIBE <sql>` in DuckDB over the <sfDir> parquet tables. Flags any
output column whose DuckDB type is HUGEINT or UHUGEINT: pandas
materializes those as float64, so the driver hash compares e.g. 300.0
against Spark's 300 and fails even when every value matches (the
d16/d19 round-3/4 failure class). Uncast SUM(BIGINT) is the usual
culprit — wrap it in CAST(... AS BIGINT).

Exits nonzero if any flagged column exists. Dev harness only (uses the
driver-side duckdb), not part of the shipped library.
"""
import json, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_TYPES = {"HUGEINT", "UHUGEINT"}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    flagged = []
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"✗ {name}: DESCRIBE failed: {e}")
            flagged.append(name)
            continue
        bad = [(c, t) for c, t, *_ in desc if t.upper() in BAD_TYPES]
        if bad:
            for c, t in bad:
                print(f"✗ {name}: column {c} is {t} (pandas float64 → driver hash fail)")
            flagged.append(name)
    if flagged:
        print(f"\nFLAGGED: {sorted(set(flagged))}")
        sys.exit(1)
    print(f"all {len(oracle)} oracle statements: no HUGEINT output columns")


if __name__ == "__main__":
    main()
