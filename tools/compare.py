#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

For each query dir under verifyOutDir: read the Spark parquet result,
run the oracle SQL from oracle_sql.json in DuckDB (tables = parquet
files in sfDir), sort columns by name, sort rows, compare values.

Built on pyarrow (NOT pandas): pandas' ns-datetime silently WRAPS
out-of-range timestamps (the SCD2 9999-12-31 sentinel becomes
1816-03-29), poisoning comparisons.
"""
import sys, json, glob, os, math, datetime
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def norm_value(v):
    """Normalize a cell to a comparable/sortable token."""
    if v is None:
        return ("0none", "")
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else repr(v))
    if isinstance(v, int):
        return ("i", "%030d" % v if v >= 0 else "-%030d" % -v)
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_value(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    return ("s", str(v))


def canon(table: pa.Table):
    cols = sorted(table.column_names)
    table = table.select(cols)
    # Normalize the widths the driver tolerates (r01 record: int32 vs
    # int64 passed schema_match) but PRESERVE timezone-ness, which it
    # does not (r01: every timestamp[us, tz=UTC] vs timestamp[us]
    # failed schema+hash). Also cast ns timestamps down to us (Spark
    # writes us; DuckDB may surface ns from ns-typed parquet).
    fields = []
    for f in table.schema:
        t = f.type
        if pa.types.is_timestamp(t):
            t = pa.timestamp("us", tz=t.tz)
        elif pa.types.is_integer(t):
            t = pa.int64()
        elif pa.types.is_floating(t):
            t = pa.float64()
        fields.append(pa.field(f.name, t))
    table = table.cast(pa.schema(fields))
    schema = [(f.name, str(f.type)) for f in table.schema]
    data = [col.to_pylist() for col in table.columns]
    rows = [tuple(norm_value(data[c][r]) for c in range(len(cols)))
            for r in range(table.num_rows)]
    rows.sort()
    return schema, rows


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
        got = pa.concat_tables([pq.read_table(f) for f in files]) \
            if files else pa.table({})
        if name not in oracle:
            print(f"[rows-only] {name}: rows={got.num_rows}")
            continue
        try:
            exp = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            gc, gr = canon(got)
            ec, er = canon(exp)
        except Exception as e:
            print(f"[FAIL] {name}: canon error: {e}")
            n_fail += 1
            continue
        status, detail = "PASS", ""
        if gc != ec:
            status, detail = "FAIL", f"schema {gc} vs {ec}"
        elif len(gr) != len(er):
            status, detail = "FAIL", f"rows {len(gr)} vs {len(er)}"
        else:
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    status = "FAIL"
                    diffs = sum(1 for x, y in zip(gr, er) if x != y)
                    detail = f"row {i}: got {a} exp {b} ({diffs} row diffs)"
                    break
        print(f"[{status}] {name}: rows={len(gr)}" + (f" — {detail}" if detail else ""))
        n_pass += status == "PASS"
        n_fail += status == "FAIL"
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
