#!/bin/bash
# Round-15 ×500 campaign (one arm per JVM — the r12 isolation rule; do
# NOT build while this runs: a recompile wipes target/classes mid-run
# and kills the arm, the round-11 lesson):
#   - bpelearn:{full,inc} at ×500: per-round learn cost at the shipped
#     operating point (r15 default = full re-agg; the rows that decide
#     it stay committed this time — r14 VERDICT ask #1a)
#   - bperegime:{full,inc}: the >=1e6-distinct-word / 256-merge regime
#     where delta maintenance could pay — the crossover probe (ask #8)
#   - incdedup at ×500: the d39 delta-pass claim through the NEW
#     bucketed persisted index; set_diff computed for every arm
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

$JAVA graft.tools.ScaleBench scale/x500 x500 bpelearn:full > /tmp/r15_bpefull.log 2>&1
echo "bpelearn:full done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 bpelearn:inc > /tmp/r15_bpeinc.log 2>&1
echo "bpelearn:inc done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 synth1e6 bperegime:full > /tmp/r15_regfull.log 2>&1
echo "bperegime:full done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 synth1e6 bperegime:inc > /tmp/r15_reginc.log 2>&1
echo "bperegime:inc done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incdedup > /tmp/r15_incdedup.log 2>&1
echo "incdedup done $(date +%T)"

grep -h '\[scale\]' /tmp/r15_bpefull.log /tmp/r15_bpeinc.log \
  /tmp/r15_regfull.log /tmp/r15_reginc.log /tmp/r15_incdedup.log 2>/dev/null \
  | sed 's/^\[scale\] //' >> SCALE_RESULTS_r15.jsonl || true
awk '!seen[$0]++' SCALE_RESULTS_r15.jsonl > SCALE_RESULTS_r15.jsonl.tmp \
  && mv SCALE_RESULTS_r15.jsonl.tmp SCALE_RESULTS_r15.jsonl
echo "campaign done; rows:"
cat SCALE_RESULTS_r15.jsonl
