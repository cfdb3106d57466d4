#!/usr/bin/env python3
"""Compare two graft.Verify output dirs produced at DIFFERENT parallelism
(e.g. SPARK_GRAFT_CPUS=5 vs 16): every query must be byte-identical after
column-sort + row-sort, proving partition-order independence of every
operator (decimal sums, sorted collect_set, fixed-seed hashing, ...).

Usage: python3 tools/check_determinism.py <outdir_a> <outdir_b>
"""
import sys, glob, os
import pyarrow.parquet as pq


def norm(p):
    t = pq.read_table(glob.glob(p + '/*.parquet')[0]).to_pandas()
    cols = sorted(t.columns)
    return sorted(map(tuple, t[cols].astype(str).values.tolist()))


def main(a_dir, b_dir):
    bad = ok = 0
    for d in sorted(glob.glob(os.path.join(a_dir, '*'))):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        other = os.path.join(b_dir, name)
        if not os.path.isdir(other):
            print('MISSING', name)
            bad += 1
            continue
        a, b = norm(d), norm(other)
        if a != b:
            diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:2]
            print('X', name, len(a), len(b), [(a[i], b[i]) for i in diffs])
            bad += 1
        else:
            ok += 1
    print(f"{ok} identical, {bad} parallelism-dependent")
    return 1 if bad else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
