"""Contract tests for the bench artifact (VERDICT r7 ask #1).

The driver captures the LAST 2000 bytes of bench.py's stdout and parses
the JSON line out of that tail; BENCH_r07 landed unparseable because the
line outgrew the capture.  These tests pin the contract without starting
Spark: the worst-case rendering of the printed line — every HEADLINE
name present, every field at its widest plausible width — must fit under
bench.LINE_BYTE_CEILING, which itself must sit under the 2000-byte
capture with margin for the trailing newline.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _worst_case_line(names):
    # Widest plausible rendering: 5-digit 2-dp times, a 4-digit total
    # would be absurdly slow but harmless to assume, max-width loads.
    obj = {
        "metric": "headline_query_wall_clock_total",
        "value": 99999.9999,
        "unit": "sec",
        "queries": {n: 999.99 for n in names},
        "sf": 0.1,
        "load1": [99.99, 99.99],
        "errs": [99999, 99],
        "detail": "BENCH_DETAIL_r99.json",
        "detail_sha256": "f" * 12,
    }
    return json.dumps(obj, separators=(",", ":"))


def test_line_fits_driver_capture():
    line = _worst_case_line(bench.HEADLINE)
    assert len(line) <= bench.LINE_BYTE_CEILING, (
        f"worst-case bench line is {len(line)} bytes — over the "
        f"{bench.LINE_BYTE_CEILING} ceiling; move fields to the detail "
        f"file or trim HEADLINE before the driver's capture truncates it")


def test_ceiling_under_driver_capture():
    # 2000-byte driver tail minus newline/prompt slop.
    assert bench.LINE_BYTE_CEILING <= 1950


def test_headroom_for_growth():
    # Each new headline entry costs ~35 bytes on the line; require room
    # for at least 4 more before the ceiling bites, so adding a round's
    # heavies doesn't silently trip the degrade path.
    line = _worst_case_line(bench.HEADLINE + [f"future_round_heavy_{i}" for i in range(4)])
    assert len(line) <= bench.LINE_BYTE_CEILING


def test_degrade_path_is_valid_json():
    # If the line ever exceeds the ceiling, bench drops the queries map
    # rather than truncating mid-JSON.  Simulate that rendering.
    obj = json.loads(_worst_case_line(bench.HEADLINE))
    obj.pop("queries")
    obj["queries_in_detail"] = True
    line = json.dumps(obj, separators=(",", ":"))
    assert len(line) < 400
    assert json.loads(line)["queries_in_detail"] is True


def test_detail_path_infers_next_round(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_DETAIL", raising=False)
    # The repo root holds BENCH_r01..r07 right now; the detail file must
    # target the NEXT round so the driver's round-close commit pairs it
    # with the artifact it writes after running bench.
    path = bench._detail_path()
    import glob
    import re
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    prior = max(int(re.search(r"BENCH_r(\d+)\.json$", p).group(1))
                for p in glob.glob(os.path.join(repo, "BENCH_r*.json")))
    assert path.endswith(f"BENCH_DETAIL_r{prior + 1:02d}.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(tmp_path / "d.json"))
    assert bench._detail_path() == str(tmp_path / "d.json")
