#!/bin/bash
# Plain-JVM launcher for graft mains (no sbt lock, no sbt overhead).
# Usage: tools/run_main.sh [-XmxNg] graft.Main args...
XMX="-Xmx${SPARK_DRIVER_MEM:-8g}"
if [[ "$1" == -Xmx* ]]; then XMX="$1"; shift; fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $XMX $OPENS -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
