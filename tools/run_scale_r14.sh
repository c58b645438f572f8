#!/bin/bash
# Round-14 ×500 campaign: per-round BPE learn cost (delta-maintained vs
# the pre-r14 full-reaggregation arm, one arm per JVM — the r12
# isolation rule) and the d39 incremental corpus-append dedup
# (build-once vs delta-pass vs full-rerun walls at 2% and 10% deltas,
# plus the uncapped exact-equivalence certificate). Do NOT build while
# this runs — a recompile wipes target/classes mid-run and kills the
# arm (round-11 lesson).
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

$JAVA graft.tools.ScaleBench scale/x500 x500 bpelearn:inc > /tmp/r14_bpeinc.log 2>&1
echo "bpelearn:inc done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 bpelearn:full > /tmp/r14_bpefull.log 2>&1
echo "bpelearn:full done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incdedup > /tmp/r14_incdedup.log 2>&1
echo "incdedup done $(date +%T)"

grep -h '\[scale\]' /tmp/r14_bpeinc.log /tmp/r14_bpefull.log /tmp/r14_incdedup.log 2>/dev/null \
  | sed 's/^\[scale\] //' >> SCALE_RESULTS_r14.jsonl || true
awk '!seen[$0]++' SCALE_RESULTS_r14.jsonl > SCALE_RESULTS_r14.jsonl.tmp \
  && mv SCALE_RESULTS_r14.jsonl.tmp SCALE_RESULTS_r14.jsonl
echo "campaign done; rows:"
cat SCALE_RESULTS_r14.jsonl
