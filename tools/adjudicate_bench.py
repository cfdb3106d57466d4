#!/usr/bin/env python3
"""Apply the calibrated bench signature rule (BUILD_NOTES r14) to a pair of
bench_details.json artifacts: a COMMITTED baseline and a CANDIDATE run
(e.g. the driver's). Prints one verdict per entry, rules applied top-down,
first hit decides:

  1. records_read or rows differs            -> STRUCTURE (exact invariants)
  2. shuffle_records ratio >= 1.5x           -> STRUCTURE
     (below that on hash-agg entries: known partial-agg adaptivity)
  3. spill_mb > 0 where committed 0          -> STRUCTURE
  4. cpu_s vs committed:
       committed cpu_s < 3 s                 -> not adjudicable (job floor)
       entry in CPI_FRAGILE                  -> cpu_s advisory (counters ruled)
       ratio >= 1.6x                         -> REOPEN
       else                                  -> ENV/OK
  5. wall alone never reopens anything.

Usage: python3 tools/adjudicate_bench.py COMMITTED.json CANDIDATE.json
       (either arg may be "git:REF" to read bench_details.json from a git
        revision, e.g. git:HEAD or git:920e879)
Exit status: number of STRUCTURE/REOPEN verdicts (0 = all clear)."""

import json
import subprocess
import sys

# measured burner coefficient > 1.2 at 2x oversubscription (BUILD_NOTES r14
# coefficient table, all 15 large-cpu heavy entries probed)
CPI_FRAGILE = {"s11_knn_graph_ivf"}

SHUFFLE_STRUCTURE_RATIO = 1.5
# two same-tree same-day r14 runs put a 6.4 s-cpu entry (s05) at 1.68x —
# pure JIT/pass noise — so mid-size entries get a looser band than the
# large ones, whose measured same-tree spread stayed under 1.5x
CPU_REOPEN_RATIO_LARGE = 1.6   # quiet cpu_s >= 10 s
CPU_REOPEN_RATIO_MID = 2.0     # quiet cpu_s in [3, 10) s
CPU_FLOOR_S = 3.0


def load(arg):
    if arg.startswith("git:"):
        raw = subprocess.check_output(["git", "show", f"{arg[4:]}:bench_details.json"])
        return json.loads(raw)
    with open(arg) as f:
        return json.load(f)


def ratio(a, b):
    return a / b if b and b > 0 else float("inf") if a and a > 0 else 1.0


def adjudicate(name, base, cand):
    def has(d, k):
        return isinstance(d.get(k), (int, float)) and d[k] >= 0

    # pre-r14 artifacts lack work counters — say so instead of passing
    counters = all(has(base, k) and has(cand, k) for k in ("records_read", "rows"))
    if counters:
        if base["records_read"] != cand["records_read"] or base["rows"] != cand["rows"]:
            return ("STRUCTURE", "records_read/rows moved: "
                    f"{base['records_read']}/{base['rows']} -> "
                    f"{cand['records_read']}/{cand['rows']}")
        if has(base, "shuffle_records") and has(cand, "shuffle_records"):
            r = ratio(cand["shuffle_records"], base["shuffle_records"])
            if r >= SHUFFLE_STRUCTURE_RATIO or (r > 0 and 1 / r >= SHUFFLE_STRUCTURE_RATIO):
                return ("STRUCTURE", f"shuffle_records {base['shuffle_records']} -> "
                        f"{cand['shuffle_records']} ({r:.2f}x)")
    if cand.get("spill_mb", 0) > 0 and base.get("spill_mb", 0) == 0:
        return ("STRUCTURE", f"spill {cand['spill_mb']} MB where committed 0")
    bc, cc = base.get("cpu_s", -1), cand.get("cpu_s", -1)
    if bc is None or bc < 0 or cc is None or cc < 0:
        return ("UNATTRIBUTED", "cpu_s sentinel in one side; counters "
                + ("checked clean" if counters else "ABSENT (pre-r14 artifact)"))
    if bc < CPU_FLOOR_S:
        return ("FLOOR", f"committed cpu {bc:.1f}s < {CPU_FLOOR_S}s — "
                "wall/cpu not adjudicable" + ("" if counters else "; counters absent"))
    r = ratio(cc, bc)
    if name in CPI_FRAGILE:
        return ("FRAGILE-OK" if counters else "FRAGILE",
                f"cpu {bc:.1f} -> {cc:.1f} ({r:.2f}x) advisory; "
                + ("work counters identical" if counters else "counters ABSENT — inspect manually"))
    cap = CPU_REOPEN_RATIO_LARGE if bc >= 10 else CPU_REOPEN_RATIO_MID
    if r >= cap:
        return ("REOPEN", f"cpu {bc:.1f} -> {cc:.1f} ({r:.2f}x >= {cap}x)"
                + ("" if counters else "; counters absent (pre-r14)"))
    return ("OK", f"cpu {bc:.1f} -> {cc:.1f} ({r:.2f}x)")


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    base_all, cand_all = load(sys.argv[1]), load(sys.argv[2])
    bad = 0
    for tier in ("queries", "heavy_10x"):
        print(f"=== {tier} ===")
        for name, b in sorted(base_all.get(tier, {}).items()):
            c = cand_all.get(tier, {}).get(name)
            if not isinstance(b, dict) or not isinstance(c, dict):
                print(f"  MISSING       {name}")
                bad += 1
                continue
            verdict, why = adjudicate(name, b, c)
            if verdict in ("STRUCTURE", "REOPEN", "FRAGILE"):
                bad += 1
            # OK and FLOOR are the quiet norm (FLOOR entries are ruled by
            # the counter checks that already ran above) — print only what
            # needs a human
            if verdict not in ("OK", "FLOOR"):
                print(f"  {verdict:13s} {name}: {why}")
    for tot in ("total_cpu_s", "heavy_total_cpu_s"):
        if tot in base_all and tot in cand_all:
            print(f"[{tot}] committed {base_all[tot]} candidate {cand_all[tot]} "
                  f"({ratio(float(cand_all[tot]), float(base_all[tot])):.2f}x)")
    print(f"{bad} entries need attention")
    sys.exit(min(bad, 125))


if __name__ == "__main__":
    main()
