#!/bin/bash
# Local t2 mimic: compile, run graft.Verify on sf0.01, DuckDB-compare.
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
sbt -batch compile > /tmp/sbt_compile.log 2>&1 || { tail -30 /tmp/sbt_compile.log; exit 1; }
rm -rf "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "$CP" graft.Verify "$SF" "$OUT" 2>/tmp/verify_stderr.log \
  || { tail -30 /tmp/verify_stderr.log; exit 1; }
grep -E "\[verify\]" /tmp/verify_stderr.log || true
RC=0
python3 tools/verify_local.py "$SF" "$OUT" || RC=$?
# Seal round evidence even when the gate fails (VERDICT r13 item 1:
# untracked BENCH/CORRECTNESS artifacts three rounds running).
bash tools/seal_round.sh || true
exit $RC
