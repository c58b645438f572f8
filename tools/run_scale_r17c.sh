#!/bin/bash
# Round-17 campaign continuation: the first run's incvecc arm used the
# superseded contraction drift and its quadratic frozen-serve walls were
# eating the campaign budget on a model already replaced — killed after
# ratio 1.0 (its rows are kept: the serve-wall cliff is real evidence).
# This script finishes the planned arms from the ORIGINAL snapshot, then
# run_scale_r17b.sh runs the superseding arms from a fresh snapshot.
set -e
cd /root/repo
SNAP=/tmp/graft-r17-classes
CP="$SNAP:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

$JAVA graft.tools.ScaleBench scale/x500 x500 incvec > /tmp/r17_incvec.log 2>&1
echo "incvec done $(date +%T)"
SPARK_GRAFT_REAL_CLASSES=96 SPARK_GRAFT_REAL_MIN_WORDS=1100000 \
  $JAVA graft.tools.ScaleBench scale/x500 x500 bpereal:full > /tmp/r17_bpereal_full.log 2>&1
echo "bpereal:full done $(date +%T)"
SPARK_GRAFT_REAL_CLASSES=96 SPARK_GRAFT_REAL_MIN_WORDS=1100000 \
  $JAVA graft.tools.ScaleBench scale/x500 x500 bpereal:inc > /tmp/r17_bpereal_inc.log 2>&1
echo "bpereal:inc done $(date +%T)"

grep -h '\[scale\]' /tmp/r17_inccompact.log /tmp/r17_incphash.log \
  /tmp/r17_incvecc.log /tmp/r17_incvec.log \
  /tmp/r17_bpereal_full.log /tmp/r17_bpereal_inc.log 2>/dev/null \
  | sed 's/^\[scale\] //' >> SCALE_RESULTS_r17.jsonl || true
awk '!seen[$0]++' SCALE_RESULTS_r17.jsonl > SCALE_RESULTS_r17.jsonl.tmp \
  && mv SCALE_RESULTS_r17.jsonl.tmp SCALE_RESULTS_r17.jsonl
echo "r17c done; rows so far:"
wc -l SCALE_RESULTS_r17.jsonl
