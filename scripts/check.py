#!/usr/bin/env python3
"""Local replica of the DRIVER's correctness gate (dev tool only, not part
of the library): run graft.Verify output against the DuckDB oracle.

This deliberately mirrors the driver's comparator, not a friendlier one:
both result sets go THROUGH PANDAS (dtype-sensitive — DuckDB HUGEINT
becomes float64 and can never hash-match Spark's int64; LIST columns
become ndarrays and crash sort_values), columns are sorted by name,
rows sorted by all columns, and every cell compared on exact repr.
Round 9 shipped five red gate rows because the previous fetchall()-based
compare was dtype-blind and "disproved" a real driver failure — see
VERDICT.md round 9. Never weaken this back to fetchall().

A DESCRIBE lint runs first: any oracle whose FINAL output column types
include HUGEINT / LIST / STRUCT is un-pandas-able by construction and
fails before any comparison runs.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [--lint-only]
"""
import sys, json, math, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_TYPES = ("HUGEINT", "[]", "STRUCT(", "MAP(")  # [] marks LIST types


def lint(con, oracle):
    """DESCRIBE every oracle; fail on output columns pandas mangles."""
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad.append((name, f"DESCRIBE failed: {e}"))
            continue
        for col, typ, *_ in desc:
            t = typ.upper()
            if any(b in t for b in BAD_TYPES):
                bad.append((name, f"column {col} is {typ} — the gate's "
                            "pandas path cannot hash this (CAST sums to "
                            "BIGINT; join arrays to strings)"))
    for name, msg in bad:
        print(f"LINT {name}: {msg}")
    return bad


def norm_cell(v):
    # numpy scalars -> python scalars first, so repr is stable
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        try:
            v = v.item()
        except (ValueError, AttributeError):
            pass
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)          # exact double repr — strict compare
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def frame_key(df):
    """The driver's shape: sort columns by name, sort_values over all
    columns (crashes on ndarray cells — that crash is the point), then
    exact-repr every cell."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    rows = [tuple(norm_cell(v) for v in t)
            for t in df.itertuples(index=False, name=None)]
    rows.sort(key=repr)  # ties among float-repr'd cells
    return list(df.columns), rows


def main(argv):
    sf_dir, out_dir = argv[0], argv[1]
    lint_only = "--lint-only" in argv
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    bad = lint(con, oracle)
    print(f"== lint: {len(oracle)} oracles, {len(bad)} un-pandas-able ==")
    if lint_only:
        return 1 if bad else 0

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = frame_key(pq.read_table(pdir).to_pandas())
        except Exception as e:
            print(f"FAIL {name}: spark side un-pandas-able: {e}")
            n_fail += 1; continue
        try:
            exp = frame_key(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if got[0] != exp[0]:
            print(f"FAIL {name}: columns {got[0]} vs {exp[0]}")
            n_fail += 1; continue
        if len(got[1]) != len(exp[1]):
            print(f"FAIL {name}: rows {len(got[1])} vs {len(exp[1])}")
            n_fail += 1; continue
        if got[1] != exp[1]:
            bad_i = next(i for i, (a, b) in enumerate(zip(got[1], exp[1]))
                         if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad_i}:")
            print(f"  cols : {got[0]}")
            print(f"  spark: {got[1][bad_i]}")
            print(f"  duck : {exp[1][bad_i]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got[1])} rows)")
        n_pass += 1
    n_fail += len(bad)
    print(f"== {n_pass} pass, {n_fail} fail (incl. {len(bad)} lint) ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
