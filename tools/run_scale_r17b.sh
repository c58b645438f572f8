#!/bin/bash
# Round-17 follow-up arms (one per JVM, classes snapshot — see
# run_scale_r17.sh). These supersede/extend two first-cut arms:
#   - incphash (take two): signature computation moved INSIDE both
#     walls — a full rerun recomputes every perceptual hash from the
#     media payloads, the delta pass only the delta's — so the walls
#     finally price what production pays (the first cut replicated
#     precomputed signatures and both arms were scan-bound)
#   - incvecc (take two): clustered drift as a pure SHIFT (the first
#     cut's contraction compressed cosine spread below SQ8 resolution;
#     recall was tie-breaking noise on both arms, although the frozen
#     serve-wall cliff — 59 s vs 15 s — was already real)
#   - incsigledger: the d51 capped-ledger contract at x500 (3 chained
#     capped appends == ledger-aware rerun, set_diff 0, binding cap)
set -e
cd /root/repo
SNAP=/tmp/graft-r17b-classes
rm -rf "$SNAP" && cp -r target/scala-2.13/classes "$SNAP"
CP="$SNAP:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

$JAVA graft.tools.ScaleBench scale/x500 x500 incsigledger > /tmp/r17_incsigledger.log 2>&1
echo "incsigledger done $(date +%T)"
SPARK_GRAFT_PHASH_REPS=8 $JAVA graft.tools.ScaleBench scale/x500 x500 incphash > /tmp/r17_incphash2.log 2>&1
echo "incphash2 done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incvecc > /tmp/r17_incvecc2.log 2>&1
echo "incvecc2 done $(date +%T)"

grep -h '\[scale\]' /tmp/r17_incsigledger.log /tmp/r17_incphash2.log \
  /tmp/r17_incvecc2.log 2>/dev/null \
  | sed 's/^\[scale\] //' >> SCALE_RESULTS_r17.jsonl || true
awk '!seen[$0]++' SCALE_RESULTS_r17.jsonl > SCALE_RESULTS_r17.jsonl.tmp \
  && mv SCALE_RESULTS_r17.jsonl.tmp SCALE_RESULTS_r17.jsonl
echo "r17b done; tail:"
tail -6 SCALE_RESULTS_r17.jsonl
