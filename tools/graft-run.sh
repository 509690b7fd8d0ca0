#!/bin/bash
# Run a graft main class directly on the compiled classes + the image's
# Spark jars, bypassing sbt (no build lock, no sbt JVM): the measurement
# loop can run while a long sbt test session holds the project lock.
# Mirrors build.sbt's forked-JVM flags (JDK17 add-opens, tuned -Xmx).
# Usage: tools/graft-run.sh <mainClass> [args...]
cd "$(dirname "$0")/.." || exit 1
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
