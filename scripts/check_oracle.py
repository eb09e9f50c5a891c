#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB oracle compare (t2 gate).

Usage: python3 scripts/check_oracle.py <sf_dir> <verify_out_dir>

Runs each oracle_sql.json entry in DuckDB over the sf_dir parquet tables and
compares against the Spark result parquet written by `graft.Verify`:
columns sorted by name, rows sorted by all columns, values compared as
strings (mirrors the driver's sort-then-hash). Exits non-zero on any
mismatch so it can gate commits.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sfdir, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    bad = []
    status = {}  # per-gate record, written as JSON next to the results
    for name in sorted(os.listdir(out)):
        p = os.path.join(out, name)
        if not os.path.isdir(p):
            continue
        spark_df = pd.read_parquet(p)
        if name not in oracle:
            print(f"{name:24s} no_oracle rows={len(spark_df)}")
            status[name] = {"status": "no_oracle", "rows": len(spark_df)}
            continue
        try:
            odf = con.sql(oracle[name]).df()
            cols_s, cols_o = sorted(spark_df.columns), sorted(odf.columns)
            if cols_s != cols_o:
                print(f"{name:24s} SCHEMA MISMATCH spark={cols_s} oracle={cols_o}")
                status[name] = {"status": "schema_mismatch",
                                "spark_cols": cols_s, "oracle_cols": cols_o}
                bad.append(name)
                continue
            s = spark_df[cols_s].sort_values(cols_s).reset_index(drop=True)
            o = odf[cols_o].sort_values(cols_o).reset_index(drop=True)
            if len(s) != len(o):
                print(f"{name:24s} ROWS MISMATCH spark={len(s)} oracle={len(o)}")
                status[name] = {"status": "rows_mismatch",
                                "spark_rows": len(s), "oracle_rows": len(o)}
                bad.append(name)
                continue
            if not s.astype(str).equals(o.astype(str)):
                diff = (s.astype(str) != o.astype(str)).any(axis=1)
                print(f"{name:24s} VALUE MISMATCH rows={len(s)}")
                print(s[diff].head(3))
                print(o[diff].head(3))
                status[name] = {"status": "value_mismatch", "rows": len(s)}
                bad.append(name)
                continue
            print(f"{name:24s} OK rows={len(s)}")
            status[name] = {"status": "ok", "rows": len(s)}
        except Exception as e:  # noqa: BLE001 - report and keep scanning
            print(f"{name:24s} ERR {type(e).__name__}: {str(e)[:200]}")
            status[name] = {"status": "err",
                            "error": f"{type(e).__name__}: {str(e)[:200]}"}
            bad.append(name)
    with open(os.path.join(out, "oracle_status.json"), "w") as f:
        json.dump({"sf_dir": sfdir, "gates": status,
                   "n_ok": sum(1 for v in status.values() if v["status"] == "ok"),
                   "n_total": len(status)}, f, indent=1, sort_keys=True)
    if bad:
        print(f"\nFAILED: {', '.join(bad)}")
        return 1
    print("\nall oracle-checked queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
