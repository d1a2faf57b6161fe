#!/usr/bin/env bash
# Build the distributable graft assembly jar: the library classes plus
# the DataSketches runtime (datasketches-java / datasketches-memory, the
# only non-Spark runtime dependencies), merged into ONE
# "-with-dependencies" jar under dist/ that the bin/ wrappers prefer —
# so a cluster whose Spark does not bundle datasketches-java still runs
# graft from a single --jars artifact (reference surface:
# bin/package.sh, get_package_variables_from_pom + assembly naming).
#
# No sbt-assembly in the offline resolver, so the merge is plain
# jar-tool extraction: dependency jars first, graft classes last (graft
# wins any path conflict), jar signatures and JPMS module descriptors
# dropped (an assembly is never a named module).
set -euo pipefail

GRAFT_BIN_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
GRAFT_HOME="$(dirname "$GRAFT_BIN_DIR")"
SCALA_BINARY_VERSION=2.13
SPARK_BINARY_VERSION=4.1
PACKAGE_VERSION="$(grep 'ThisBuild / version' "$GRAFT_HOME/build.sbt" \
  | sed 's/.*"\(.*\)".*/\1/')"

if [ -n "${SPARK_HOME:-}" ]; then
  SPARK_JARS="$SPARK_HOME/jars"
else
  SPARK_JARS=/opt/spark/jars
fi

(cd "$GRAFT_HOME" && sbt -batch package 1>&2)
# NOT a bare `ls ... | head -1`: a -tests.jar (from any earlier
# Test/package) sorts BEFORE the library jar and would silently ship
# test classes instead of the library
CLASSES_JAR="$(ls "$GRAFT_HOME"/target/scala-$SCALA_BINARY_VERSION/*_$SCALA_BINARY_VERSION-*.jar \
  | grep -v -- '-tests\.jar$' | grep -v -- '-sources\.jar$' | head -1)"
# grep without -q: under pipefail, grep -q's early exit SIGPIPEs unzip
# and fails the pipeline even on a match
if ! unzip -l "$CLASSES_JAR" | grep 'graft/GraftExtensions.class' >/dev/null; then
  echo "ERROR: $CLASSES_JAR does not contain graft/GraftExtensions.class" 1>&2
  exit 1
fi

STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT
for dep in "$SPARK_JARS"/datasketches-java-*.jar \
           "$SPARK_JARS"/datasketches-memory-*.jar; do
  (cd "$STAGE" && jar xf "$dep")
done
(cd "$STAGE" && jar xf "$CLASSES_JAR")
rm -f "$STAGE"/META-INF/*.SF "$STAGE"/META-INF/*.DSA "$STAGE"/META-INF/*.RSA \
      "$STAGE"/module-info.class 2>/dev/null || true

mkdir -p "$GRAFT_HOME/dist"
PACKAGE_JAR_NAME="graft_${SCALA_BINARY_VERSION}_spark${SPARK_BINARY_VERSION}-${PACKAGE_VERSION}-with-dependencies.jar"
OUT="$GRAFT_HOME/dist/$PACKAGE_JAR_NAME"
(cd "$STAGE" && jar cf "$OUT" .)
echo "Packaged: $OUT" 1>&2
echo "$OUT"
