#!/usr/bin/env bash
# Run a graft main class with plain java (no sbt lock held) against the
# last `sbt package` jar. Usage: tools/run_class.sh graft.Verify <args...>
# Env: SPARK_DRIVER_MEM (default 8g). Rebuild the jar first when sources
# changed: sbt package.
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/gellystreamingspark_2.13-0.1.0.jar
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$JAR:/opt/spark/jars/*" "$@"
