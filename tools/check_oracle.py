#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Mirrors the driver: run each oracle SQL in DuckDB over views named after
the parquet tables, sort columns by name, sort rows, compare values.
Dev tooling only — the Scala library never depends on this.
"""
import sys, json, glob
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(sql):
        if only and name not in only:
            continue
        q = sql[name]
        try:
            spark = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            orc = con.execute(q).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        if sorted(spark.columns) != sorted(orc.columns):
            print(f"FAIL {name}: columns {sorted(spark.columns)} vs {sorted(orc.columns)}")
            n_fail += 1; continue
        cols = sorted(spark.columns)
        sp = spark[cols].sort_values(by=cols).reset_index(drop=True)
        oc = orc[cols].sort_values(by=cols).reset_index(drop=True)
        if len(sp) != len(oc):
            print(f"FAIL {name}: rows {len(sp)} vs {len(oc)}"); n_fail += 1; continue
        bad = []
        for c in cols:
            a, b = sp[c], oc[c]
            try:
                if a.dtype == np.float64 or b.dtype == np.float64:
                    aa = a.astype(float); bb = b.astype(float)
                    both_nan = aa.isna() & bb.isna()
                    eq = (aa == bb) | both_nan
                else:
                    eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    i = int(np.argmin(eq.values))
                    bad.append((c, a.iloc[i], b.iloc[i]))
            except Exception as e:
                bad.append((c, "cmp-error", str(e)))
        if bad:
            print(f"FAIL {name}: {len(bad)} col diffs, e.g. {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
