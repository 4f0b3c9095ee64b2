#!/usr/bin/env bash
# Run a graft tool main directly with java (bypasses sbt), with the JDK17
# add-opens Spark needs and a heap from GRAFT_HEAP (default 16g).
# Usage: GRAFT_HEAP=48g tools/jtool.sh graft.tools.ScaleProbe --isolate ...
set -euo pipefail
cd "$(dirname "$0")/.."
HEAP="${GRAFT_HEAP:-16g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
if [ ! -d target/scala-2.13/classes ]; then
  echo "jtool: target/scala-2.13/classes not found — run 'sbt compile' first" >&2
  exit 1
fi
if ! ls /opt/spark/jars/spark-core_*.jar >/dev/null 2>&1; then
  echo "jtool: no spark-core jar under /opt/spark/jars — check the Spark install" >&2
  exit 1
fi
exec java $OPENS -Xmx"$HEAP" -Xms"$HEAP" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${GRAFT_TMPDIR:+-Djava.io.tmpdir=$GRAFT_TMPDIR} \
  ${GRAFT_LOCAL_DIRS:+-Dspark.local.dir=$GRAFT_LOCAL_DIRS} \
  -cp "$CP" "$@"
