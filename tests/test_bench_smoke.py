"""bench.py smoke: the driver's performance surface must never crash.

A bench.py failure costs the round its BENCH_r{N}.json, so the harness
gets the same protection as the query surface: run it end-to-end as a
SUBPROCESS (bench restarts the gateway JVM, which would kill the shared
pytest Spark session if run in-process) at sf0.001 with scaling
disabled, and assert the contract — exactly one JSON line on stdout
with the driver-required keys, small enough for the driver's
~2000-char stdout-tail parse window.

Serial discipline (round-4 advice + the repo's bench-window rule):
this test is marked ``bench_serial`` and SKIPS itself when a Spark
gateway JVM is already alive in this process — two Spark clusters on
the same CPUs contend and pollute both measurements.  In the full
``pytest tests/`` run the file sorts first, so it executes before any
shared-session test boots the JVM and the contract stays covered.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.bench_serial


def test_bench_emits_one_valid_json_line(tmp_path):
    from pyspark import SparkContext

    if SparkContext._gateway is not None:
        pytest.skip(
            "a Spark JVM is already running in this process; bench.py "
            "must never share the CPUs with other Spark work (run this "
            "test first or standalone)"
        )
    receipt = tmp_path / "LAST_RUN.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_REP="2",
        SPARK_GRAFT_BENCH_SCALING="0",
        SPARK_GRAFT_BENCH_BUDGET="60",
        # keep the sf0.001 smoke receipt out of BENCH/LAST_RUN.json so
        # it never overwrites the last real full-protocol run's receipt
        SPARK_GRAFT_BENCH_RECEIPT=str(receipt),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    # the driver parses the line out of a bounded stdout tail
    assert len(lines[0]) <= 1900, len(lines[0])
    d = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf", "throughput"):
        assert key in d, key
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["queries"]["extract_e2e"] > 0
    assert d["throughput"]["n_docs"] == 1000  # 500 docs x rep 2
    assert d["sf"] == "0.001"
    # the full receipt payload is preserved on the side
    with open(receipt) as f:
        full = json.load(f)
    assert full["queries"]["extract_e2e"] == d["queries"]["extract_e2e"]
