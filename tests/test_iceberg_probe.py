"""Real-Iceberg readiness: if a runtime jar ever appears in this
environment, prove the Lakehouse merge/rollback contract through
actual `MERGE INTO` / `rollback_to_snapshot` SQL. Skipped (with the
documented reason) in containers without the jar — the parquet shim
in lakehouse.py is the stand-in, same verb set."""

import glob
import os
import subprocess
import sys

import pyspark
import pytest

_JARS = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*runtime*.jar"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not _JARS,
    reason="no Iceberg runtime jar in this container; Lakehouse parquet shim "
    "provides the contract (lakehouse.py docstring)",
)
def test_real_iceberg_merge_contract(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "iceberg_probe.py"), str(tmp_path / "wh")],
        cwd=REPO, timeout=560, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ICEBERG_CONTRACT_OK" in out.stdout
