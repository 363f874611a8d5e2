#!/bin/bash
# One serial BenchOne leg in a fresh JVM.
#   /tmp/leg.sh <classesdir> <sfdir> <reps> <parts> <label> <query...>
# Extra env honored: SPARK_GRAFT_SRP_TRANSIT, SPARK_GRAFT_CPUS (default 32)
set -e
CLASSES=$1; SF=$2; REPS=$3; PARTS=$4; LABEL=$5; shift 5
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
echo "[leg] label=$LABEL classes=$CLASSES sf=$SF reps=$REPS parts=$PARTS transit=${SPARK_GRAFT_SRP_TRANSIT:-f32} queries=$*"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=$REPS SPARK_GRAFT_PARTS=$PARTS \
SPARK_GRAFT_METRICS=1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.BenchOne "$@" 2>/dev/null \
  | grep -E "benchone|benchmetrics|benchquiet" | sed "s/^/[$LABEL] /"
