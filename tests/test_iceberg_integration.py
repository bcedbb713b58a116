"""Guarded Iceberg-runtime integration test (VERDICT r04 #5): the
MERGE/evolve SQL in streaming/sink_iceberg.py is golden-tested as text
(test_sinks_sql.py), but must also EXECUTE against a real Iceberg
runtime wherever one is present — skip (don't fake) when the jar is
absent, so a cluster user is never the first to run this path."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest


def _iceberg_jars() -> list[str]:
    import pyspark

    jars = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "iceberg-spark-runtime*.jar")
    )
    env_jar = os.environ.get("ICEBERG_JAR")
    if env_jar and os.path.exists(env_jar):
        jars.append(env_jar)
    return jars


@pytest.mark.skipif(
    not _iceberg_jars(),
    reason="iceberg-spark-runtime jar not on the classpath (set ICEBERG_JAR "
    "or add it to pyspark/jars); recipe: scripts/iceberg_integration.py",
)
def test_iceberg_merge_sink_end_to_end(tmp_path):
    """Run the full integration script in its own JVM (Iceberg needs
    session extensions at build time, which the shared test session
    doesn't carry): create → MERGE ×2 → replay no-op → evolve →
    final-state equality vs the batch oracle."""
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "iceberg_integration.py",
    )
    env = dict(os.environ)
    jar = _iceberg_jars()[0]
    env["PYSPARK_SUBMIT_ARGS"] = f"--jars {jar} pyspark-shell"
    proc = subprocess.run(
        [sys.executable, script, "--warehouse", str(tmp_path / "wh")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert '"ok": true' in proc.stdout
