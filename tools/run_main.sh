#!/bin/bash
# Launch a graft main class directly with java (no sbt) so long bench
# runs don't hold the sbt build lock. Mirrors build.sbt's javaOptions.
# Usage: tools/run_main.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), GRAFT_CLASSES (default: a snapshot
# of target/scala-2.13/classes taken at launch, so concurrent sbt
# compiles can't swap class files under the running JVM).
set -e
cd /root/repo
MAIN=$1; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
if [ -z "$GRAFT_CLASSES" ]; then
  GRAFT_CLASSES=$(mktemp -d /tmp/graft_classes.XXXX)
  cp -r target/scala-2.13/classes/* "$GRAFT_CLASSES/"
  trap 'rm -rf "$GRAFT_CLASSES"' EXIT
fi
# java runs as a child (no exec): the EXIT trap must fire to delete the
# classpath snapshot — exec would replace the shell and leak it
java $ADD_OPENS $GRAFT_JAVA_OPTS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$GRAFT_CLASSES:/opt/spark/jars/*" "graft.$MAIN" "$@"
