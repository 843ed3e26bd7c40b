#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark).

Usage: python3 tools/check.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same testdata
tables, and diffs (schema-lite, row count, values)."""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(res_dir, "*.parquet")):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_tbl = pq.read_table(res_dir)
            got_cols = sorted(got_tbl.column_names)
            got = [tuple(norm(r[c]) for c in got_cols) for r in got_tbl.to_pylist()]
            want_rel = con.sql(sql)
            want_cols = sorted(want_rel.columns)
            idx = [want_rel.columns.index(c) for c in want_cols]
            want = [tuple(norm(r[i]) for i in idx) for r in want_rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = [(i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w]
        if bad:
            i, g, w = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; first at {i}:")
            print(f"   cols {got_cols}")
            print(f"   got  {g}")
            print(f"   want {w}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
