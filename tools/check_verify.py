#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle comparison.

Usage: python3 tools/check_verify.py <sfDir> <verifyOutDir>

For each query output parquet written by graft.Verify, runs the oracle SQL
(from oracle_sql.json) in DuckDB over the same sf tables and compares:
row count, schema (column names), and a hash over column-name-sorted,
row-sorted values. Queries without oracle SQL get a rows>0 check.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize types: ints -> int64, floats -> float64 rounded, ts -> iso str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
        elif s.dtype == object:
            out[c] = s.apply(lambda v: str(v))
        else:
            out[c] = s
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns)).reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_rows_only = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        qname = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        got = pd.read_parquet(qdir)
        if qname not in oracles:
            status = "ROWS_ONLY_OK" if len(got) > 0 else "ROWS_ONLY_EMPTY"
            if len(got) > 0: n_rows_only += 1
            else: n_fail += 1
            print(f"{status:16s} {qname:24s} rows={len(got)}")
            continue
        try:
            exp = con.sql(oracles[qname]).df()
        except Exception as e:
            print(f"ORACLE_ERROR     {qname:24s} {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"SCHEMA_MISMATCH  {qname:24s} got={list(g.columns)} exp={list(e.columns)}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"ROWS_MISMATCH    {qname:24s} got={len(g)} exp={len(e)}")
            n_fail += 1
        elif not g.equals(e):
            diff = (g != e) if g.shape == e.shape else None
            ndiff = int(diff.any(axis=1).sum()) if diff is not None else -1
            print(f"VALUE_MISMATCH   {qname:24s} rows={len(g)} diff_rows={ndiff}")
            mism = diff.any(axis=1)
            print("  got:", g[mism].head(3).to_dict("records"))
            print("  exp:", e[mism].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"MATCH            {qname:24s} rows={len(g)}")
            n_pass += 1
    print(f"\nSUMMARY: {n_pass} oracle-match, {n_rows_only} rows-only-ok, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
