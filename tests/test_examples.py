"""The examples/ scripts are the showcased end-to-end pipelines — they
must actually run. Each executes in a subprocess (own SparkSession) at
sf0.001; a failure anywhere in the chain (including corpus_prep's final
write_sized_files sink) fails the suite."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "script",
    [
        "corpus_prep.py",
        "tpch_analytics.py",
        "table_management.py",
        "product_analytics.py",
        "retrieval_eval.py",
        "ann_index_lifecycle.py",
        "ingest_monitoring.py",
        "crawl_frontier.py",
    ],
)
def test_example_runs(script):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script),
         "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    if script == "corpus_prep.py":
        assert "size-targeted files" in proc.stdout  # the sink step ran
