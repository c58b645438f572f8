#!/bin/bash
# Round-11 x500 measurement campaign (VERDICT r10 items #2 and #4):
#   1. rebuild the x500 clean corpus (2.55M docs; scale/ is gitignored scratch)
#   2. d13cand A/B: shuffle.partitions 32 vs 128, ONE ARM PER JVM
#   3. spans pin-vs-regen A/B at x500, ONE ARM PER JVM
# Each arm is an isolated JVM (the r10 lesson: in-JVM two-arm A/Bs are
# order-dominated). Emits go to per-arm logs; collect with grep '\[scale\]'.
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

if [ ! -d scale/x500/documents.parquet ]; then
  $JAVA graft.tools.MakeScaleCorpus 500 clean scale/x500 > /tmp/r11_make_x500.log 2>&1
fi
echo "corpus done $(date +%T)"
SPARK_GRAFT_SHUFFLE=32  $JAVA graft.tools.ScaleBench scale/x500 x500 d13cand > /tmp/r11_d13_32.log 2>&1
echo "d13cand/32 done $(date +%T)"
SPARK_GRAFT_SHUFFLE=128 $JAVA graft.tools.ScaleBench scale/x500 x500 d13cand > /tmp/r11_d13_128.log 2>&1
echo "d13cand/128 done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 ab:spans:pin   > /tmp/r11_spans_pin.log 2>&1
echo "spans/pin done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 ab:spans:regen > /tmp/r11_spans_regen.log 2>&1
echo "spans/regen done $(date +%T)"
grep -h '\[scale\]' /tmp/r11_d13_32.log /tmp/r11_d13_128.log /tmp/r11_spans_pin.log /tmp/r11_spans_regen.log | sed 's/^\[scale\] //'
