#!/bin/sh
# Build the SnapshotCatalog DSv2 connector jar against the installed
# pyspark's jars (no network; javac from the system JDK 17).
set -e
cd "$(dirname "$0")"
SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
rm -rf out && mkdir -p out ../dist
javac -encoding UTF-8 -cp "$SPARK_JARS/*" -d out src/camelotspark/snapcat/SnapshotCatalog.java
jar cf ../dist/camelot-snapshot-catalog.jar -C out .
echo "built dist/camelot-snapshot-catalog.jar"
