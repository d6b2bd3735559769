"""Contract tests for the bench artifact (VERDICT r7 ask #1, re-margined
r9, restored to the driver-joinable map in r12).

The driver captures the LAST 2000 bytes of bench.py's stdout and parses
the JSON line out of that tail; BENCH_r07 landed unparseable because the
line outgrew the capture.  r9 moved per-query times to a centisecond int
array whose names lived in the sha-bound detail file — which the
driver's comparator does not follow, so PERF_r10 and PERF_r11 both
degenerated to an empty per-query comparison (VERDICT r11 ask #1).  r12
restores the inline ``queries`` name->seconds map (the driver's join
key) and keeps the compact q_cs array as the DEGRADE path if the map
ever outgrows the ceiling.  These tests pin the byte contract statically
AND run the real main() end-to-end on a 2-query subset so a runtime
crash (e.g. a HEADLINE name referencing a renamed registry entry) fails
CI instead of surfacing at round close (ADVICE r8).
"""

import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY


def _line(queries):
    obj = {
        "metric": "headline_query_wall_clock_total",
        "value": 99999.9999,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "load1": [99.99, 99.99],
        "detail": "BENCH_DETAIL_r99.json",
        "detail_sha256": "f" * 12,
    }
    return json.dumps(obj, separators=(",", ":"))


def _degraded_line(n_queries):
    # The q_cs fallback rendering at its widest plausible values.
    obj = {
        "metric": "headline_query_wall_clock_total",
        "value": 99999.9999,
        "unit": "sec",
        "sf": 0.1,
        "load1": [99.99, 99.99],
        "detail": "BENCH_DETAIL_r99.json",
        "detail_sha256": "f" * 12,
        "n_queries": n_queries,
        "q_cs": [99999] * n_queries,
        "q_names": "detail:queries (same order)",
    }
    return json.dumps(obj, separators=(",", ":"))


def test_headline_names_all_registered():
    """Every HEADLINE entry must resolve in the registry — a rename that
    silently drops a bench row is a contract break, not a skip."""
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing


def test_queries_map_fits_driver_capture():
    """The inline name->seconds map — the driver's per-query join key —
    must fit the ceiling with every query at a worst-plausible 99.99 s
    (the whole bench would be declared broken long before any single
    entry hit 100 s; the degrade ladder still guards that case)."""
    line = _line({n: 99.99 for n in bench.HEADLINE})
    assert len(line) <= bench.LINE_BYTE_CEILING, (
        f"worst-case bench line is {len(line)} bytes — over the "
        f"{bench.LINE_BYTE_CEILING} ceiling; move fields to the detail "
        f"file or trim HEADLINE before the driver's capture truncates it")


def test_ceiling_under_driver_capture():
    # 2000-byte driver tail minus newline/prompt slop.
    assert bench.LINE_BYTE_CEILING <= 1950


def test_degrade_ladder_fits_at_projected_growth():
    """If HEADLINE grows past what the map can carry, the q_cs fallback
    must still fit with plenty of slack (+12 projected entries)."""
    line = _degraded_line(len(bench.HEADLINE) + 12)
    assert len(line) <= 0.70 * bench.LINE_BYTE_CEILING, (
        f"{len(line)} bytes at projected growth — under 30% slack")


def test_degrade_path_is_valid_json():
    # Final fallback: queries live only in the detail file.
    obj = json.loads(_degraded_line(len(bench.HEADLINE)))
    obj.pop("q_cs")
    obj["queries_in_detail"] = True
    line = json.dumps(obj, separators=(",", ":"))
    assert len(line) < 400
    assert json.loads(line)["queries_in_detail"] is True


def test_detail_path_infers_next_round(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_DETAIL", raising=False)
    # The repo root holds BENCH_r01..rNN; the detail file must target
    # the NEXT round so the driver's round-close commit pairs it with
    # the artifact it writes after running bench.
    path = bench._detail_path()
    import glob
    import re
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    # Filter like _detail_path: the driver also drops non-round files
    # matching the glob (e.g. BENCH_r11_c8.json, its 8-core scaling run).
    prior = max(int(m.group(1))
                for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
                if (m := re.search(r"BENCH_r(\d+)\.json$", p)))
    assert path.endswith(f"BENCH_DETAIL_r{prior + 1:02d}.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(tmp_path / "d.json"))
    assert bench._detail_path() == str(tmp_path / "d.json")


def test_bench_main_runs_end_to_end(tmp_path):
    """Execute the REAL bench.py as a subprocess on two cheap queries at
    sf0.001: the printed tail must parse as the contract line with the
    inline queries map, the detail file must exist, and the echoed sha
    must equal the sha256 of the exact file bytes (the r8 convention
    hashed pre-newline content and cost a false-alarm cycle)."""
    detail = tmp_path / "detail.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY="tpch_q6_forecast_revenue,dialect_distinct_on",
        SPARK_GRAFT_BENCH_DETAIL=str(detail),
        SPARK_GRAFT_BENCH_LOG=str(tmp_path / "stderr.log"),
    )
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    r = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                       capture_output=True, text=True, env=env,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    # The driver parses the LAST 2000 bytes of stdout.
    tail = r.stdout[-2000:]
    line = [ln for ln in tail.splitlines() if ln.strip().startswith("{")][-1]
    obj = json.loads(line)
    assert obj["metric"] == "headline_query_wall_clock_total"
    assert list(obj["queries"]) == ["tpch_q6_forecast_revenue",
                                    "dialect_distinct_on"]
    assert all(v > 0 for v in obj["queries"].values())
    assert obj["value"] > 0
    assert len(line.encode()) <= bench.LINE_BYTE_CEILING
    raw = detail.read_bytes()
    assert hashlib.sha256(raw).hexdigest()[:12] == obj["detail_sha256"]
    dobj = json.loads(raw)
    assert list(dobj["queries"]) == ["tpch_q6_forecast_revenue",
                                     "dialect_distinct_on"]

def test_bench_empty_filter_exits_nonzero(tmp_path):
    """A typo'd SPARK_GRAFT_BENCH_ONLY must exit nonzero BEFORE any
    measurement instead of printing a valid contract line with value 0
    (ADVICE r9); the check runs pre-session, so this is fast."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY="no_such_query_after_rename",
        SPARK_GRAFT_BENCH_LOG=str(tmp_path / "stderr.log"),
    )
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    r = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                       capture_output=True, text=True, env=env,
                       timeout=120)
    assert r.returncode != 0
    assert "matches no HEADLINE" in (r.stderr + r.stdout)
    assert "headline_query_wall_clock_total" not in r.stdout
