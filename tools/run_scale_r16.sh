#!/bin/bash
# Round-16 ×500 campaign (one arm per JVM — the r12 isolation rule).
# Runs from a CLASSES SNAPSHOT (/tmp/graft-r16-classes), so sbt builds in
# the repo cannot wipe target/classes mid-arm (the round-11 killer).
#   - incsig16: the d42 family recalibrated — count-calibrated band width
#     so pairs_full > 0 (the r15 row was vacuous: zero pairs both arms);
#     capped + uncapped arms, uncapped asserts set_diff = 0
#   - incphash / incsem / incvec / incmulti: first ×500 rows for m08 /
#     d45 / d44 / d46 — every mode asserts non-vacuous traffic
#   - incvec doubles as the AutoRebuild evidence: frozen-quantizer vs
#     genuinely-retrained recall@5 at append ratios 0.2–4.0
#   - bpereal:{inc,full}: both arms at the vocabulary-expanded ~443k-word
#     REAL-ish table, 1024 merges (the r15 crossover gap: all delta-arm
#     wins were synthetic; the real ×500 point sat below the crossover)
set -e
cd /root/repo
SNAP=/tmp/graft-r16-classes
rm -rf "$SNAP" && cp -r target/scala-2.13/classes "$SNAP"
CP="$SNAP:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -cp $CP $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

$JAVA graft.tools.ScaleBench scale/x500 x500 incsig16 > /tmp/r16_incsig.log 2>&1
echo "incsig16 done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incphash > /tmp/r16_incphash.log 2>&1
echo "incphash done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incsem > /tmp/r16_incsem.log 2>&1
echo "incsem done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incvec > /tmp/r16_incvec.log 2>&1
echo "incvec done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incmulti > /tmp/r16_incmulti.log 2>&1
echo "incmulti done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 incdel > /tmp/r16_incdel.log 2>&1
echo "incdel done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 bpereal:inc > /tmp/r16_bpereal_inc.log 2>&1
echo "bpereal:inc done $(date +%T)"
$JAVA graft.tools.ScaleBench scale/x500 x500 bpereal:full > /tmp/r16_bpereal_full.log 2>&1
echo "bpereal:full done $(date +%T)"

grep -h '\[scale\]' /tmp/r16_incsig.log /tmp/r16_incphash.log \
  /tmp/r16_incsem.log /tmp/r16_incvec.log /tmp/r16_incmulti.log /tmp/r16_incdel.log \
  /tmp/r16_bpereal_inc.log /tmp/r16_bpereal_full.log 2>/dev/null \
  | sed 's/^\[scale\] //' >> SCALE_RESULTS_r16.jsonl || true
awk '!seen[$0]++' SCALE_RESULTS_r16.jsonl > SCALE_RESULTS_r16.jsonl.tmp \
  && mv SCALE_RESULTS_r16.jsonl.tmp SCALE_RESULTS_r16.jsonl
echo "campaign done; rows:"
cat SCALE_RESULTS_r16.jsonl
