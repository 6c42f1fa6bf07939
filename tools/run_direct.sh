#!/bin/bash
# Direct-JVM runner for any graft main (ScaleUp, Verify, tools.*):
# bypasses sbt so long up-scale runs can't collide with the build lock
# or trigger a recompile mid-run. Usage:
#   tools/run_direct.sh <mem> <mainClass> [args...]
# e.g. tools/run_direct.sh 48g graft.tools.ScaleUp /root/testdata/sf0.1 target/sf1 10
set -euo pipefail
cd /root/repo
MEM="$1"; MAIN="$2"; shift 2
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# stale-build guard: this script exists to avoid recompiles, so a source
# edit since the last `sbt compile` would silently run OLD bytecode — a
# stale ScaleUp/Verify run can mislead a correctness gate. Warn loudly.
# Compare against the NEWEST .class file, not the classes dir mtime:
# zinc's incremental compile rewrites class files inside nested package
# dirs without bumping the top-level dir, so the dir-mtime check cried
# wolf on every up-to-date build (ADVICE r15).
NEWEST_CLASS="$(find target/scala-2.13/classes -name '*.class' -printf '%T@ %p\n' 2>/dev/null | sort -rn | head -1 | cut -d' ' -f2-)"
if [ -z "$NEWEST_CLASS" ]; then
  echo "WARNING: no compiled classes under target/scala-2.13/classes (sbt compile first)" >&2
elif [ -n "$(find src/main -name '*.scala' -newer "$NEWEST_CLASS" -print -quit 2>/dev/null)" ]; then
  echo "WARNING: src/main has edits newer than the newest compiled .class — running STALE bytecode (sbt compile first)" >&2
fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Djava.awt.headless=true -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC "-Xmx$MEM" \
  -cp "$CP" "$MAIN" "$@"
