"""bench.py smoke: the driver's performance surface must never crash.

A bench.py failure costs the round its BENCH_r{N}.json, so the harness
gets the same protection as the query surface: run it end-to-end as a
SUBPROCESS (bench restarts the gateway JVM, which would kill the shared
pytest Spark session if run in-process) at sf0.001 with scaling
disabled, and assert the contract — exactly one JSON line on stdout
with the driver-required keys.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_valid_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_REP="2",
        SPARK_GRAFT_BENCH_SCALING="0",
        SPARK_GRAFT_BENCH_BUDGET="60",
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
    d = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf", "throughput"):
        assert key in d, key
    assert d["unit"] == "sec" and d["value"] > 0
    assert d["queries"]["extract_e2e"] > 0
    assert d["throughput"]["n_docs"] == 1000  # 500 docs x rep 2
    assert d["sf"] == "0.001"
