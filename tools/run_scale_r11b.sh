#!/bin/bash
# Remainder of the round-11 x500 campaign (the 128-partition arm died to a
# concurrent recompile wiping target/classes — do not build while this runs).
set -e
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

SPARK_GRAFT_SHUFFLE=128 $JAVA graft.tools.ScaleBench scale/x500 x500 d13cand > /tmp/r11_d13_128.log 2>&1
echo "d13cand/128 done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 ab:spans:pin   > /tmp/r11_spans_pin.log 2>&1
echo "spans/pin done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 ab:spans:regen > /tmp/r11_spans_regen.log 2>&1
echo "spans/regen done $(date +%T)"
grep -h '\[scale\]' /tmp/r11_d13_128.log /tmp/r11_spans_pin.log /tmp/r11_spans_regen.log | sed 's/^\[scale\] //'
