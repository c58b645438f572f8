#!/bin/bash
# Round-12 completion of the x500 campaign (VERDICT r11 item #6, carrying
# r10 items #2/#4): d13cand shuffle-partitions 32-vs-128 A/B and spans
# pin-vs-regen, each arm an isolated JVM (the r10 lesson: in-JVM two-arm
# A/Bs are order-dominated; the r11 lesson: do NOT build while this runs —
# a recompile wiping target/classes killed the 128 arm).
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

SPARK_GRAFT_SHUFFLE=32  $JAVA graft.tools.ScaleBench scale/x500 x500 d13cand > /tmp/r12_d13_32.log 2>&1
echo "d13cand/32 done $(date +%T)"
SPARK_GRAFT_SHUFFLE=128 $JAVA graft.tools.ScaleBench scale/x500 x500 d13cand > /tmp/r12_d13_128.log 2>&1
echo "d13cand/128 done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 ab:spans:pin   > /tmp/r12_spans_pin.log 2>&1
echo "spans/pin done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 ab:spans:regen > /tmp/r12_spans_regen.log 2>&1
echo "spans/regen done $(date +%T)"
# `|| true`: with zero [scale] rows (all arms died) grep exits 1 and
# set -e would kill the script before reporting; the dedup-append keeps
# re-runs from double-counting rows already in the committed jsonl
grep -h '\[scale\]' /tmp/r12_d13_32.log /tmp/r12_d13_128.log /tmp/r12_spans_pin.log /tmp/r12_spans_regen.log 2>/dev/null \
  | sed 's/^\[scale\] //' >> SCALE_RESULTS_r12.jsonl || true
awk '!seen[$0]++' SCALE_RESULTS_r12.jsonl > SCALE_RESULTS_r12.jsonl.tmp \
  && mv SCALE_RESULTS_r12.jsonl.tmp SCALE_RESULTS_r12.jsonl
echo "campaign done; rows:"
cat SCALE_RESULTS_r12.jsonl
