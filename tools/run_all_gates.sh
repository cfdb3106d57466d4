#!/usr/bin/env bash
# Run every local gate in sequence: compile+specs, correctness oracle,
# parallelism-independence, and the Python façade round-trip.
#   tools/run_all_gates.sh [sfdir]     (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"

echo "=== 1/4 sbt test ==="
# FULL output goes to a log first, pass/fail judged on sbt's exit code,
# and failures are surfaced by grepping the log afterwards — the r16
# 1-in-6 flake lost its failing test's IDENTITY because output was
# filtered before the "*** FAILED ***" line printed (BUILD_NOTES r16);
# capture-then-grep makes the next flake name its test
rm -f /tmp/gate_sbt_test.log
if sbt -batch test > /tmp/gate_sbt_test.log 2>&1; then
  # `|| true`: a cosmetic summary-format change must not abort the gates
  # under set -e — pass/fail was already decided by sbt's exit code
  grep -E '^\[info\] (All tests passed|Tests: succeeded)' /tmp/gate_sbt_test.log | tail -2 || true
else
  echo "sbt test FAILED — failing suites/tests (full log: /tmp/gate_sbt_test.log):"
  grep -E '\*\*\* FAILED \*\*\*|ABORTED|Tests: succeeded|error\]' /tmp/gate_sbt_test.log | head -40
  exit 1
fi

echo "=== 2/4 correctness oracle ($SF) ==="
rm -rf /tmp/gate_verify
sbt -batch "runMain graft.Verify $SF /tmp/gate_verify" > /tmp/gate_verify.log 2>&1 \
  || { tail -20 /tmp/gate_verify.log; exit 1; }
grep '\[verify\]' /tmp/gate_verify.log || true
python3 tools/check_oracle.py "$SF" /tmp/gate_verify

echo "=== 3/4 parallelism independence (5 vs 16 threads) ==="
rm -rf /tmp/gate_det5 /tmp/gate_det16
SPARK_GRAFT_CPUS=5  sbt -batch "runMain graft.Verify $SF /tmp/gate_det5"  > /dev/null 2>&1
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $SF /tmp/gate_det16" > /dev/null 2>&1
python3 tools/check_determinism.py /tmp/gate_det5 /tmp/gate_det16 | tail -2

echo "=== 4/4 Python façade ==="
bash tools/run_python_tests.sh 2>&1 | tail -3

echo "ALL GATES GREEN"
