#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir> [name ...]

The driver loads both results into pandas (Spark parquet via pyarrow,
DuckDB via .df()), sorts by all columns, and hash-compares stringified
values.  That makes the compare DTYPE-SENSITIVE:
  - DuckDB SUM(INTEGER) returns HUGEINT -> float64 in pandas ("490.0"),
    while Spark sum(long) is int64 ("490")  => CAST(SUM(..) AS BIGINT).
  - DECIMAL columns: Spark parquet -> decimal.Decimal objects ("123.40"),
    DuckDB .df() -> float64 ("123.4")       => CAST final aggs AS DOUBLE
    on BOTH sides (keep decimal internally for exactness).
  - Array/list columns crash pandas sort     => join to strings.
This replica stringifies per-column with pandas dtypes preserved so it
predicts the driver's verdict.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df):
    # per-column astype(str) like the driver: no row-wise dtype upcasting,
    # and all-midnight datetime64 columns render as bare dates
    cols = sorted(df.columns)
    sdf = df[cols].astype(str)
    out = sorted(map(tuple, sdf.values.tolist()))
    return cols, out


def main(sfdir, outdir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = n_noracle = 0
    for d in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        tbl = pq.read_table(files[0]) if files else None
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {tbl.num_rows if tbl else 'MISSING'} rows")
            continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"x {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        try:
            sdf = tbl.to_pandas()
            sc, sr = norm(sdf)
            dc, dr = norm(ddf)
        except Exception as e:
            print(f"x {name}: PANDAS COMPARE ERROR: {e}")
            n_bad += 1
            continue
        sd = dict(sdf.dtypes.astype(str))
        dd = dict(ddf.dtypes.astype(str))
        if sc != dc:
            print(f"x {name}: COLUMN MISMATCH spark={sc} duck={dc}")
            n_bad += 1
        elif sr != dr:
            diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"x {name}: VALUE MISMATCH nspark={len(sr)} nduck={len(dr)}")
            print(f"    spark dtypes={sd}")
            print(f"    duck  dtypes={dd}")
            for i in diff:
                print(f"    spark[{i}]={sr[i]}")
                print(f"    duck [{i}]={dr[i]}")
            if len(sr) != len(dr):
                only_s = set(sr) - set(dr)
                only_d = set(dr) - set(sr)
                for x in list(only_s)[:3]: print(f"    only-spark: {x}")
                for x in list(only_d)[:3]: print(f"    only-duck : {x}")
            n_bad += 1
        else:
            mism = {c: (sd[c], dd[c]) for c in sc if sd.get(c) != dd.get(c)}
            note = f"  [dtype warn {mism}]" if mism else ""
            print(f"+ {name}: {len(sr)} rows match{note}")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_noracle} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
