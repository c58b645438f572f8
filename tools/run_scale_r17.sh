#!/bin/bash
# Round-17 ×500 campaign (one arm per JVM — the r12 isolation rule).
# Runs from a CLASSES SNAPSHOT (/tmp/graft-r17-classes), so sbt builds in
# the repo cannot wipe target/classes mid-arm (the round-11 killer).
# Arms (cheap → expensive, so partial campaigns still land evidence):
#   - inccompact: compaction priced + certified at ×500 (r16 VERDICT #3)
#     — build, 2 appends, 14% delete, compact; rewrite wall, set_diff 0,
#     post-compact probe plan pinned one-Exchange + bucketed, gc certified
#   - incphash ×8 signature replicas (r16 VERDICT #5): the delta arm must
#     finally separate from the full rerun on a corpus whose band join
#     costs real time; set_diff still 0
#   - incvecc: CLUSTERED drift (appended mass contracted toward one
#     direction — the regime §3i flagged unmeasured) at 1000 queries
#   - incvec: uniform drift re-run at 1000 queries (r16 VERDICT #4: the
#     100-query curve was noise-limited; RebuildAppendRatio re-derived
#     from this curve)
#   - bpereal:{full,inc} at 96 classes (>1.2M distinct words, r16
#     VERDICT #6): the first REAL point above the corrected 1M gate
set -e
cd /root/repo
SNAP=/tmp/graft-r17-classes
rm -rf "$SNAP" && cp -r target/scala-2.13/classes "$SNAP"
CP="$SNAP:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

$JAVA graft.tools.ScaleBench scale/x500 x500 inccompact > /tmp/r17_inccompact.log 2>&1
echo "inccompact done $(date +%T)"
SPARK_GRAFT_PHASH_REPS=8 $JAVA graft.tools.ScaleBench scale/x500 x500 incphash > /tmp/r17_incphash.log 2>&1
echo "incphash done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incvecc > /tmp/r17_incvecc.log 2>&1
echo "incvecc done $(date +%T)"
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
echo "campaign done; rows:"
cat SCALE_RESULTS_r17.jsonl
