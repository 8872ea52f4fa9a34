import os
import subprocess
import sys
import tempfile

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SNAPCAT_JAR = os.path.join(REPO_ROOT, "dist", "camelot-snapshot-catalog.jar")


def _ensure_snapcat_jar() -> bool:
    """Build the DSv2 SnapshotCatalog jar from java/ if it's missing
    (javac ships in this environment; build is offline and ~2 s)."""
    if os.path.exists(SNAPCAT_JAR):
        return True
    build = os.path.join(REPO_ROOT, "java", "build.sh")
    try:
        subprocess.run(["sh", build], check=True, capture_output=True, timeout=120)
    except Exception:
        return False
    return os.path.exists(SNAPCAT_JAR)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("camelot-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if _ensure_snapcat_jar():
        # the DSv2 snapshot catalog (java/): writeTo("snap.ns.tbl")
        # commits real V2 snapshots — see tests/test_snapshot_catalog.py
        builder = (
            builder.config("spark.jars", SNAPCAT_JAR)
            .config("spark.sql.catalog.snap", "camelotspark.snapcat.SnapshotCatalog")
            .config(
                "spark.sql.catalog.snap.warehouse",
                tempfile.mkdtemp(prefix="camelot_snapcat_wh_"),
            )
        )
    s = builder.getOrCreate()
    yield s
    s.stop()
