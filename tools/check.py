#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet + <out>/oracle_sql.json), then this script
runs each oracle SQL in DuckDB over the same sf dir and diffs.

Usage: python3 tools/check.py <sfDir> <verifyOut> [query ...]
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats; treat NaN/None uniformly
    for c in df.columns:
        try:
            df[c] = pd.to_numeric(df[c])
        except (ValueError, TypeError):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def dtype_lint(got_raw: pd.DataFrame, exp_raw: pd.DataFrame) -> list:
    """The driver's hasher stringifies AFTER pandas dtype coercion, so a
    value-exact query still fails the gate when the two sides render
    differently: DuckDB HUGEINT fetches as float64 (q103, r12) and DATE
    fetches as datetime64 while Spark parquet DATE stays object (q114,
    r12). Lint the RAW frames (pre-canon) and fail loudly on the class,
    not the instance:
      - either side datetime64-typed        -> emit date_format strings
      - integer on one side, float on other -> CAST the oracle to BIGINT
    """
    issues = []
    gk = {c: got_raw[c].dtype.kind for c in got_raw.columns}
    ek = {c: exp_raw[c].dtype.kind for c in exp_raw.columns}
    for c in sorted(set(gk) | set(ek)):
        g, e = gk.get(c), ek.get(c)
        if g == "M" or e == "M":
            issues.append(f"{c}: datetime-typed output (spark={g} oracle={e}) — emit yyyy-MM-dd strings")
        elif g is not None and e is not None and {g, e} == {"i", "f"}:
            issues.append(f"{c}: int/float skew (spark={g} oracle={e}) — CAST the wider side AS BIGINT")
    return issues

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):          # Spark-written multi-part table dir
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output"); n_bad += 1; continue
        try:
            got_raw = pd.read_parquet(f"{out_dir}/{name}")
            exp_raw = con.execute(sql).fetchdf()
            got = canon(got_raw.copy())
            exp = canon(exp_raw.copy())
        except Exception as e:
            print(f"ERR   {name}: {e}"); n_bad += 1; continue
        lint = dtype_lint(got_raw, exp_raw)
        if lint:
            print(f"DTYPE {name}: " + "; ".join(lint)); n_bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"COLS  {name}: spark={list(got.columns)} oracle={list(exp.columns)}"); n_bad += 1; continue
        if len(got) != len(exp):
            print(f"ROWS  {name}: spark={len(got)} oracle={len(exp)}"); n_bad += 1; continue
        neq = (got != exp) & ~(got.isna() & exp.isna())
        bad_rows = neq.any(axis=1)
        dtypes_note = ""
        if list(got.dtypes) != list(exp.dtypes):
            dtypes_note = " [dtype mismatch: " + "; ".join(
                f"{c}: {g}!={e}" for c, g, e in zip(got.columns, got.dtypes, exp.dtypes) if g != e) + "]"
        if bad_rows.sum() == 0:
            print(f"ok    {name} ({len(got)} rows){dtypes_note}"); n_ok += 1
        else:
            print(f"DIFF  {name}: {bad_rows.sum()}/{len(got)} rows differ{dtypes_note}")
            print("  spark:\n", got[bad_rows].head(3).to_string())
            print("  oracle:\n", exp[bad_rows].head(3).to_string())
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
