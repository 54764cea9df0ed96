#!/usr/bin/env bash
# One-command packaged-jar deploy smoke (the r11 verify-skill recipe,
# scripted so the cluster-real launch path cannot rot silently):
#   sbt package → graft-setup a throwaway deployment → seed one sheet +
#   control row → bin/graft-submit poll-once under plain spark-submit →
#   assert rc=0 AND a Success runlog row landing in g_sheets.jar_t1.
# Skips (rc 0, "SKIP") when /opt/spark is absent — the same guard the
# tagged specs use. Any other deviation exits non-zero with the runlog
# printed, so CI-style use is just: tools/smoke_jar_deploy.sh
set -uo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SPARK_HOME="${SPARK_HOME:-/opt/spark}"
if [ ! -x "$SPARK_HOME/bin/spark-submit" ]; then
  echo "SKIP: $SPARK_HOME/bin/spark-submit not present"
  exit 0
fi

DEP="$(mktemp -d /tmp/graft_jarsmoke.XXXXXX)"
# cleanup only on PASS — failure paths call `keep` first so the logs the
# FAIL messages point at survive for debugging
trap 'rm -rf "$DEP"' EXIT
keep() { trap - EXIT; echo "(artifacts kept at $DEP)"; }

(cd "$REPO" && sbt -batch package > "$DEP/package.log" 2>&1) || {
  keep; echo "FAIL: sbt package (see $DEP/package.log)"; tail -20 "$DEP/package.log"; exit 1; }

"$REPO/bin/graft-setup" "$DEP/dep" > /dev/null || { keep; echo "FAIL: graft-setup"; exit 1; }
mkdir -p "$DEP/dep/docs/Doc"
printf 'k,v\n1,a\n2,b\n' > "$DEP/dep/docs/Doc/S1.csv"
printf '"Doc","S1","","warehouse","jar_t1","","yes","","","",""\n' >> "$DEP/dep/control.csv"

if SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    "$REPO/bin/graft-submit" "$DEP/dep/engine.properties" poll-once \
    > "$DEP/submit.log" 2>&1; then :; else
  rc=$?; keep
  echo "FAIL: graft-submit rc=$rc (see $DEP/submit.log)"
  tail -30 "$DEP/submit.log"
  exit 1
fi

# exactly the seeded job's Success row: status field "Success" AND the
# jar_t1 target on one runlog line (a Failure row merely MENTIONING
# Success in its message must not pass)
if grep -q '"Success","g_sheets.jar_t1"' "$DEP/dep/runlog.csv" 2>/dev/null; then
  echo "PASS: packaged-jar poll-once delivered; runlog:"
  cat "$DEP/dep/runlog.csv"
  exit 0
fi
keep
echo "FAIL: no Success row for g_sheets.jar_t1 in runlog"
cat "$DEP/dep/runlog.csv" 2>/dev/null || echo "(no runlog written)"
tail -30 "$DEP/submit.log"
exit 1
