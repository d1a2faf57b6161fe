#!/usr/bin/env bash
# Shared launcher plumbing: locate Spark and the graft jar.
# Sourced by bin/spark-shell, bin/spark-sql, bin/pyspark (pattern of the
# reference's bin/package.sh + find_resource, reference: bin/spark-shell:44-55).

set -euo pipefail

GRAFT_BIN_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
GRAFT_HOME="$(dirname "$GRAFT_BIN_DIR")"

if [ -n "${SPARK_HOME:-}" ]; then
  SPARK_DIR="$SPARK_HOME"
elif [ -d /opt/spark ]; then
  SPARK_DIR=/opt/spark
else
  echo "SPARK_HOME is not set and /opt/spark does not exist" 1>&2
  exit 1
fi

find_graft_jar() {
  # a packaged assembly (bin/package.sh) wins: it runs without sbt on the
  # path and without datasketches-java in the cluster's Spark jars
  GRAFT_JAR="$(ls "$GRAFT_HOME"/dist/*-with-dependencies.jar 2>/dev/null | head -1 || true)"
  if [ -n "$GRAFT_JAR" ]; then
    return
  fi
  GRAFT_JAR="$(ls "$GRAFT_HOME"/target/scala-2.13/*spark*_2.13-*.jar 2>/dev/null | head -1 || true)"
  if [ -z "$GRAFT_JAR" ]; then
    echo "graft jar not found under target/scala-2.13 - building with sbt package" 1>&2
    (cd "$GRAFT_HOME" && sbt -batch package 1>&2)
    GRAFT_JAR="$(ls "$GRAFT_HOME"/target/scala-2.13/*spark*_2.13-*.jar | head -1)"
  fi
}

find_graft_jar
echo "Using graft jar: $GRAFT_JAR (Spark: $SPARK_DIR)" 1>&2
