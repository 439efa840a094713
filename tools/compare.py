#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

For each query dir under verifyOutDir: read the Spark parquet result,
run the oracle SQL from oracle_sql.json in DuckDB (tables = parquet
files in sfDir), sort columns by name, sort rows, and compare values.
Exact match required (floats compared bitwise after float64 cast).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: v is None or isinstance(v, (datetime.date, datetime.datetime))).all():
            df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pq.read_table(f).to_pandas() for f in files]) \
            if files else pd.DataFrame()
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        status, detail = "PASS", ""
        if list(g.columns) != list(e.columns):
            status, detail = "FAIL", f"columns {list(g.columns)} vs {list(e.columns)}"
        elif len(g) != len(e):
            status, detail = "FAIL", f"rows {len(g)} vs {len(e)}"
        else:
            for c in g.columns:
                gv, ev = g[c].to_numpy(), e[c].to_numpy()
                if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
                    eq = (gv.astype(np.float64) == ev.astype(np.float64)) | \
                         (pd.isna(gv) & pd.isna(ev))
                else:
                    eq = (gv == ev) | (pd.isna(gv) & pd.isna(ev))
                if not eq.all():
                    i = int(np.argmin(eq))
                    status = "FAIL"
                    detail = f"col {c} row {i}: got {gv[i]!r} exp {ev[i]!r} ({int((~eq).sum())} diffs)"
                    break
        print(f"[{status}] {name}: rows={len(g)}" + (f" — {detail}" if detail else ""))
        n_pass += status == "PASS"
        n_fail += status == "FAIL"
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
