#!/bin/bash
# Run a graft main class directly with java (no sbt), using the compiled
# classes in target/scala-2.13/classes and the Spark jars at /opt/spark/jars.
# Usage: tools/run_main.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g) and the usual SPARK_GRAFT_* vars.
set -e
MAIN="$1"; shift
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 \
  -cp "$CP" "$MAIN" "$@"
