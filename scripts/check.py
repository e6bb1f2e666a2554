#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part
of the library): run graft.Verify output against the DuckDB oracle.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)          # exact double repr — strict compare
    if isinstance(v, dict):
        return tuple((k, norm_cell(x)) for k, x in sorted(v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def table_key(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort(key=repr)
    return [names[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        tbl = pq.read_table(pdir)
        got_names = tbl.column_names
        got_rows = [tuple(d.values()) for d in tbl.to_pylist()]
        try:
            res = con.execute(sql)
            exp_names = [d[0] for d in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        gk = table_key(got_names, got_rows)
        ek = table_key(exp_names, exp_rows)
        if sorted(got_names) != sorted(exp_names):
            print(f"FAIL {name}: columns {sorted(got_names)} vs {sorted(exp_names)}")
            n_fail += 1; continue
        if len(gk[1]) != len(ek[1]):
            print(f"FAIL {name}: rows {len(gk[1])} vs {len(ek[1])}")
            n_fail += 1; continue
        if gk[1] != ek[1]:
            bad = next(i for i, (a, b) in enumerate(zip(gk[1], ek[1])) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  cols : {gk[0]}")
            print(f"  spark: {gk[1][bad]}")
            print(f"  duck : {ek[1][bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(gk[1])} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
