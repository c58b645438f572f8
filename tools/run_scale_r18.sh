#!/bin/bash
# Round-18 ×500 campaign (one arm per JVM — the r12 isolation rule).
# Runs from a CLASSES SNAPSHOT (/tmp/graft-r18-classes), so sbt builds in
# the repo cannot wipe target/classes mid-arm (the round-11 killer).
# Arms (cheap → expensive, so partial campaigns still land evidence):
#   - incsemledger: the d53 capped-ledger contract on the SEMANTIC
#     (embedding) family at ×500 (r17 VERDICT #3) — capped maintained
#     appends' kept set must equal the ledger-aware rerun (set_diff 0),
#     ledger binding
#   - inccompact: re-certified with the gc GRACE PERIOD ON (r17 VERDICT
#     #5 — gc(dir) now defaults to a 20-min grace; gc_set_diff must
#     still be 0 and the pre-compact generation must survive)
#   - incvecc: clustered drift re-run with the RETRAINED+RETUNED arm
#     (r17 VERDICT #2 — geometry re-derived via cellsFor/probeFor at
#     the accumulated count; must dominate frozen on BOTH serve wall
#     and recall at ratios ≥ 1)
#   - bpereal:{full,inc} at 192 classes (~3M distinct words, r17 VERDICT
#     #8): the second REAL point above the 1M gate — does the delta-arm
#     win grow with scale?
set -e
cd /root/repo
SNAP=/tmp/graft-r18-classes
rm -rf "$SNAP" && cp -r target/scala-2.13/classes "$SNAP"
CP="$SNAP:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

$JAVA graft.tools.ScaleBench scale/x500 x500 incsemledger > /tmp/r18_incsemledger.log 2>&1
echo "incsemledger done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 inccompact > /tmp/r18_inccompact.log 2>&1
echo "inccompact done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incvecc > /tmp/r18_incvecc.log 2>&1
echo "incvecc done $(date +%T)"
SPARK_GRAFT_REAL_CLASSES=192 SPARK_GRAFT_REAL_MIN_WORDS=2200000 \
  $JAVA graft.tools.ScaleBench scale/x500 x500 bpereal:full > /tmp/r18_bpereal_full.log 2>&1
echo "bpereal:full done $(date +%T)"
SPARK_GRAFT_REAL_CLASSES=192 SPARK_GRAFT_REAL_MIN_WORDS=2200000 \
  $JAVA graft.tools.ScaleBench scale/x500 x500 bpereal:inc > /tmp/r18_bpereal_inc.log 2>&1
echo "bpereal:inc done $(date +%T)"

grep -h '\[scale\]' /tmp/r18_incsemledger.log /tmp/r18_inccompact.log \
  /tmp/r18_incvecc.log /tmp/r18_bpereal_full.log /tmp/r18_bpereal_inc.log \
  2>/dev/null | sed 's/^\[scale\] //' >> SCALE_RESULTS_r18.jsonl || true
awk '!seen[$0]++' SCALE_RESULTS_r18.jsonl > SCALE_RESULTS_r18.jsonl.tmp \
  && mv SCALE_RESULTS_r18.jsonl.tmp SCALE_RESULTS_r18.jsonl
echo "campaign done; rows:"
cat SCALE_RESULTS_r18.jsonl
