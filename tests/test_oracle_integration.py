"""Oracle-differential integration test (SURVEY §5.1) — the primary gate.

Runs every declared query on PySpark and its oracle SQL on DuckDB over the
sf0.001 parquet and requires an exact match, via the same harness the
driver-equivalent local check uses.
"""

import subprocess
import sys


def test_all_declared_queries_match_oracle():
    proc = subprocess.run(
        [sys.executable, "scripts/check_oracle.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
