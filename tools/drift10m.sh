#!/bin/bash
# 10 M drift campaign (VERDICT r16 items 3 + 5): the combined production
# posture (frontier probing + retrain-every-2) and the probing-only
# control, at 10 M vectors, sequential so neither run's walls are
# contended by the other. Launched with plain `java` against the sbt
# classpath so the sbt server stays free; JVM flags mirror build.sbt.
set -u -o pipefail
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JVM="-Xmx20g -XX:+UseParallelGC -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

run() {
  local tag="$1"; shift
  echo "=== $tag: $* (start $(date -u +%H:%M:%S)) ==="
  java $JVM $OPENS -cp "$CP" graft.CorpusScaleBench "$@" \
    2>&1 | grep -v "WARN\|INFO" | tail -40 || {
      echo "=== $tag FAILED — aborting ==="; exit 1; }
  echo "=== $tag done ($(date -u +%H:%M:%S)) ==="
}

run combined 10000000 --semantic --daily --geometry=drift \
  --index-probes=2 --index-margin=1.02 --retrain-every=2
run probing-only 10000000 --semantic --daily --geometry=drift \
  --index-probes=2 --index-margin=1.02
