"""Storage-weather probe (tools/io_probe.py) — pure-host unit tests, no
Spark. Pins the /proc parsing and the sample loop shape so the gate-v3
calibration instrument cannot silently regress between rounds."""
import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.io_probe import _dev_for, _disk_counters, _fsync_ms  # noqa: E402


def test_dev_for_resolves_backing_device(tmp_path):
    dev = _dev_for(str(tmp_path))
    if dev is None:
        pytest.skip("no /proc/diskstats on this host")
    counters = _disk_counters(dev)
    assert counters is not None
    ios, io_ticks, in_queue = counters
    assert ios >= 0 and io_ticks >= 0 and in_queue >= 0


def test_fsync_ms_positive_and_file_written(tmp_path):
    f = str(tmp_path / "probe")
    ms = _fsync_ms(f, b"x" * 4096)
    assert ms > 0
    assert os.path.getsize(f) == 4096


def test_calib_mode_emits_summary(tmp_path):
    out = subprocess.run(
        [sys.executable, "tools/io_probe.py", "calib", str(tmp_path), "2", "0.5"],
        capture_output=True, text=True, timeout=60,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert out.returncode == 0, out.stderr
    rec = json.loads(out.stdout.strip())
    assert rec["n"] >= 2
    assert rec["fsync_ms_med"] > 0
    # leaves no probe file behind
    assert not [p for p in os.listdir(tmp_path) if p.startswith(".io_probe_")]
