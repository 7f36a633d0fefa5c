#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB against the sfDir
parquet tables, sorts columns by name + rows by all columns, and
compares values. Mirrors what the driver does so mismatches surface
before the round gate.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sorting/hashing across backends
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.apply(lambda c: c.map(cell))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
            n_fail += 1
            continue
        e_n, g_n = norm(exp), norm(got)
        if len(e_n) != len(g_n):
            print(f"FAIL {name}: rows exp={len(e_n)} got={len(g_n)}")
            n_fail += 1
            continue
        if e_n.equals(g_n):
            print(f"PASS {name} ({len(e_n)} rows)")
            n_pass += 1
        else:
            neq = (e_n != g_n)
            bad_cols = [c for c in e_n.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"   {c}[{idx}]: exp={e_n[c][idx]!r} got={g_n[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
