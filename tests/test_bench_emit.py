"""bench.py evidence contract (round 5): the stdout line must carry the
per-query timings and efficiency in its LAST 2000 chars (the driver keeps
only that tail — BENCH_r04.json lost its timings to this), and the FULL
record must land in BENCH/bench_r{N}.json. Pure Python — no Spark."""
import contextlib
import io
import json
import os

import bench


def _capture(queries, total, perf, scaling, tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.emit_result(queries, total, perf, scaling)
    return buf.getvalue().strip()


def test_stdout_tail_carries_queries_and_efficiency(tmp_path, monkeypatch):
    queries = {f"q{i}": float(i) for i in range(12)}
    scaling = {
        "cores_lo": 1, "cores_hi": 4, "efficiency": 0.83, "certified": True,
        # bulky file-only keys must NOT reach stdout
        "canaries": [{"x": "y" * 4000}],
        "protocol": "p" * 1500,
        "window_gate": "w" * 1500,
        "clean_estimates_full_log": [0.8] * 50,
        "clean_estimates_current_gate": [0.8] * 50,
        "timings_lo": {"kd": 8.0},
        "timings_hi": {"kd": 2.0},
    }
    line = _capture(queries, 99.0, {"tiles_per_sec": 10.0}, scaling,
                    tmp_path, monkeypatch)
    rec = json.loads(line)
    # one line, slim enough that even a 2000-char tail keeps the queries
    assert "\n" not in line and len(line) < 2000
    keys = list(rec)
    assert keys[-1] == "efficiency" and keys[-2] == "queries"
    assert rec["queries"] == queries and rec["efficiency"] == 0.83
    assert "canaries" not in rec["scaling"] and "protocol" not in rec["scaling"]
    # the tail parse the driver does must succeed trivially
    assert json.loads(line[-2000:]) == rec


def test_full_record_written_with_everything(tmp_path, monkeypatch):
    scaling = {"efficiency": None, "error": "no chain", "certified": False,
               "canaries": [1, 2, 3]}
    line = _capture({"q1": 1.0}, 1.0, None, scaling, tmp_path, monkeypatch)
    assert json.loads(line)["efficiency"] is None
    path = os.path.join(str(tmp_path), "BENCH", "bench_r01.json")
    full = json.load(open(path))
    assert full["scaling"]["canaries"] == [1, 2, 3]
    assert full["queries"] == {"q1": 1.0}


def test_round_number_from_recorded_benches(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    assert bench._round_num() == 1
    open(os.path.join(str(tmp_path), "BENCH_r04.json"), "w").write("{}")
    assert bench._round_num() == 5
