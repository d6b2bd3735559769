"""bench.py driver contract: ONE JSON line with the required keys."""

from __future__ import annotations

import json
import subprocess
import sys


def test_bench_streaming_emits_single_json_line():
    out = subprocess.run(
        [sys.executable, "scripts/bench_streaming.py", "4"],
        capture_output=True, text=True, timeout=900,
        env={"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
        cwd="/root/repo")
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    payload = json.loads(lines[-1])
    assert payload["job"] == "stream_dedup_ingest"
    assert payload["batches"] == 4
    assert payload["sec"] > 0 and payload["batches_per_sec"] > 0
    # kept cardinality is deterministic and bounded by the input size
    assert 0 < payload["kept"] <= payload["docs_in"]


def test_bench_emits_single_json_line():
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=900,
        env={"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
        cwd="/root/repo")
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    payload = json.loads(lines[-1])
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], (int, float))
    assert payload["queries"] and all(
        isinstance(v, (int, float)) for v in payload["queries"].values())
    # per-query output cardinality: same keys as "queries", int counts,
    # so drift-vs-noise adjudication lives in the artifact itself
    assert set(payload["rows"]) == set(payload["queries"])
    assert all(isinstance(v, int) and v >= 0
               for v in payload["rows"].values())
    assert payload["sf"] == 0.001
