#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare graft.Verify's
parquet dumps against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 scripts/oracle_check.py <verifyOutDir> <sfDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows; stringify values stably."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
            exp_rel = con.sql(sql)
            exp_cols, exp = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"ERROR  {name}: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"SCHEMA {name}: spark={got_cols} oracle={exp_cols}")
            failures += 1
        elif got != exp:
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"VALUES {name}: {len(got)} vs {len(exp)} rows; first diffs: {diff}")
            failures += 1
        else:
            print(f"MATCH  {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
