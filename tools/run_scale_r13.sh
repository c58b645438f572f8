#!/bin/bash
# Round-13 ×500 campaign: the new learning/codec operators (learn mode:
# BPE induction, NB quality scorer, PPM decode pass, streaming quota
# state posture) plus a streamcur re-run exercising the r12-ADVICE fix
# (stream-side survivor count + uncapped progress listener). One mode
# per JVM; do NOT build while this runs — a recompile wipes
# target/classes mid-run and kills the arm (round-11 lesson).
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

$JAVA graft.tools.ScaleBench scale/x500 x500 learn > /tmp/r13_learn.log 2>&1
echo "learn done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 streamcur > /tmp/r13_streamcur.log 2>&1
echo "streamcur done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 cur4 > /tmp/r13_cur4.log 2>&1
echo "cur4 done $(date +%T)"

grep -h '\[scale\]' /tmp/r13_learn.log /tmp/r13_streamcur.log /tmp/r13_cur4.log 2>/dev/null \
  | sed 's/^\[scale\] //' >> SCALE_RESULTS_r13.jsonl || true
awk '!seen[$0]++' SCALE_RESULTS_r13.jsonl > SCALE_RESULTS_r13.jsonl.tmp \
  && mv SCALE_RESULTS_r13.jsonl.tmp SCALE_RESULTS_r13.jsonl
echo "campaign done; rows:"
cat SCALE_RESULTS_r13.jsonl
