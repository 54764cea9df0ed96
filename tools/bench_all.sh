#!/usr/bin/env bash
# Regenerate ALL FOUR BENCH_full artifacts (sf0.001 smoke, sf0.1 official,
# sf1, sf3 — each per-query median-of-3 except the smoke) in one run.
# REQUIRED whenever the catalog grows: the judge diffs artifacts by query
# count, and a stale artifact misrepresents the round (round-state rule).
#
# ~55 min total on the 32-cpu host. Run via nohup and poll the log:
#   nohup bash tools/bench_all.sh > /tmp/bench_chain.log 2>&1 &
#
# Gotchas (learned r12):
#   - `sbt | tail` masks compile errors (tail exits 0): typecheck pending
#     edits BEFORE launching, or check each stage wrote its artifact.
#   - Do NOT run another sbt against this repo while the chain runs —
#     target-lock contention, and a mid-run recompile can feed a forked
#     bench JVM mixed classes.
#   - sf1/sf3 must exist under target/sfdata (graft.ScaleUp; see the
#     verify skill for the exact invocations).
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
echo "=== sf0.001 smoke ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt -batch "runMain graft.Bench" 2>&1 | tail -2
echo "=== sf0.1 reps3 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 sbt -batch "runMain graft.Bench" 2>&1 | tail -2
echo "=== sf1 reps3 ==="
SPARK_GRAFT_SF_DIR="$PWD/target/sfdata/sf1" SPARK_GRAFT_BENCH_REPS=3 sbt -batch "runMain graft.Bench" 2>&1 | tail -2
echo "=== sf3 reps3 ==="
SPARK_GRAFT_SF_DIR="$PWD/target/sfdata/sf3" SPARK_GRAFT_BENCH_REPS=3 sbt -batch "runMain graft.Bench" 2>&1 | tail -2
echo "=== DONE ==="
