#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Loads each <verify_outdir>/<name> parquet (Spark result), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the raw
testdata parquet, and compares sorted rows + column names.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_rows(cols, rows):
    # sort columns by name, then rows; stringify values for comparison
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = n_noracle = 0
    for d in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        tbl = pq.read_table(files[0]) if files else None
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {tbl.num_rows if tbl else 'MISSING'} rows")
            continue
        try:
            duck = con.execute(oracle[name])
            dcols = [c[0] for c in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        scols = tbl.column_names
        srows = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"✗ {name}: COLUMN MISMATCH spark={sc} duck={dc}")
            n_bad += 1
        elif sr != dr:
            diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"✗ {name}: ROW MISMATCH nspark={len(sr)} nduck={len(dr)}")
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
            print(f"✓ {name}: {len(sr)} rows match")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_noracle} rows-only")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
