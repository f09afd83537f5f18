#!/usr/bin/env python
"""CO-LOCATED storage-weather probe (gate-v3 GROUNDWORK — NOT wired into
any gate this round).

Round-4 residual (BENCH/BASELINE.md "Honest residual"): certified chain
v22's second hi run stretched ~25% with IDLE-level cpu_tile and zero
steal — the JVM was blocked on storage (shared-VM disk throttling), a
weather mode neither the reserved-CPU canary nor the co-located CPU probe
(co_canary.py) can see. Gate v3 adds a storage signal; per the protocol's
no-retroactive-gates rule its thresholds must be DECLARED FROM CALIBRATION
BEFORE any v3 chain runs. This tool is that calibration instrument plus
the future during-run prober. Three signals per sample, all host-state,
never job-performance:

  fsync_ms — wall ms to write 64 KiB + fsync a probe file on the same
      filesystem the job's tile sink writes. Direct end-to-end latency of
      the path that stalls the JVM under host I/O throttling. The probe
      I/O (64 KiB / interval) is ~0.001% of device bandwidth, and is
      identical at every parallelism level, so it cancels in lo/hi.
  util — Δio_ticks / interval from /proc/diskstats for the device backing
      the probe path: fraction of the interval the device had I/O in
      flight.
  await_ms — Δtime_in_queue / Δcompleted_ios: average queued+service time
      per I/O. Under host-side throttling await spikes while util can
      stay moderate (requests stall in the virtio queue).

Probe mode (chain-runner lifetime, O_APPEND-atomic JSONL like co_canary):
    io_probe.py probe OUT_FILE PROBE_DIR [INTERVAL_S]
Calibration mode (standalone, prints one JSON summary line):
    io_probe.py calib PROBE_DIR DURATION_S [INTERVAL_S]
"""
from __future__ import annotations

import json
import os
import signal
import statistics
import sys
import time


def _dev_for(path: str) -> str | None:
    """diskstats name for the whole device backing `path` (partition-
    insensitive: exact (major,minor) match first, then same-major disk
    whose minor is the partition's base)."""
    st = os.stat(path)
    major, minor = os.major(st.st_dev), os.minor(st.st_dev)
    rows = []
    try:
        with open("/proc/diskstats") as fh:
            for line in fh:
                f = line.split()
                rows.append((int(f[0]), int(f[1]), f[2]))
    except OSError:
        return None
    for mj, mn, name in rows:
        if (mj, mn) == (major, minor):
            return name
    cand = [r for r in rows if r[0] == major and r[1] <= minor]
    return max(cand, key=lambda r: r[1])[2] if cand else None


def _disk_counters(dev: str) -> tuple[int, int, int] | None:
    """(completed_ios, io_ticks_ms, time_in_queue_ms) for `dev`."""
    try:
        with open("/proc/diskstats") as fh:
            for line in fh:
                f = line.split()
                if f[2] == dev:
                    rd_ios, wr_ios = int(f[3]), int(f[7])
                    io_ticks, in_queue = int(f[12]), int(f[13])
                    return rd_ios + wr_ios, io_ticks, in_queue
    except (OSError, IndexError, ValueError):
        pass
    return None


def _fsync_ms(probe_file: str, payload: bytes) -> float:
    t0 = time.monotonic()
    fd = os.open(probe_file, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
    try:
        os.write(fd, payload)
        os.fsync(fd)
    finally:
        os.close(fd)
    return (time.monotonic() - t0) * 1000.0


def _sample_loop(probe_dir: str, interval: float, emit) -> None:
    os.makedirs(probe_dir, exist_ok=True)
    probe_file = os.path.join(probe_dir, f".io_probe_{os.getpid()}")
    payload = os.urandom(65536)  # incompressible, defeats dedup/zero paths
    dev = _dev_for(probe_dir)
    prev = _disk_counters(dev) if dev else None
    prev_t = time.monotonic()
    try:
        while True:
            time.sleep(interval)
            fs_ms = _fsync_ms(probe_file, payload)
            now = time.monotonic()
            cur = _disk_counters(dev) if dev else None
            util = await_ms = None
            if prev and cur:
                d_ios = cur[0] - prev[0]
                dt_ms = (now - prev_t) * 1000.0
                util = round(min(1.0, (cur[1] - prev[1]) / max(dt_ms, 1)), 4)
                await_ms = (
                    round((cur[2] - prev[2]) / d_ios, 3) if d_ios > 0 else 0.0
                )
            prev, prev_t = cur, now
            emit(
                {
                    "t": round(time.time(), 2),
                    "fsync_ms": round(fs_ms, 3),
                    "util": util,
                    "await_ms": await_ms,
                    "dev": dev,
                }
            )
    finally:
        try:
            os.unlink(probe_file)
        except OSError:
            pass


def probe_main(out_file: str, probe_dir: str, interval: float) -> None:
    fd = os.open(out_file, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)

    def emit(rec: dict) -> None:
        os.write(fd, (json.dumps(rec) + "\n").encode())

    def _stop(_s, _f):
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    _sample_loop(probe_dir, interval, emit)


def calib_main(probe_dir: str, duration: float, interval: float) -> None:
    recs: list[dict] = []
    t_end = time.monotonic() + duration

    def emit(rec: dict) -> None:
        recs.append(rec)
        if time.monotonic() >= t_end:
            raise SystemExit(0)

    try:
        _sample_loop(probe_dir, interval, emit)
    except SystemExit:
        pass

    def q(vals, p):
        vals = sorted(v for v in vals if v is not None)
        if not vals:
            return None
        return round(vals[min(len(vals) - 1, int(p * len(vals)))], 3)

    fs = [r["fsync_ms"] for r in recs]
    ut = [r["util"] for r in recs]
    aw = [r["await_ms"] for r in recs]
    print(
        json.dumps(
            {
                "n": len(recs),
                "dev": recs[0]["dev"] if recs else None,
                "fsync_ms_med": round(statistics.median(fs), 3) if fs else None,
                "fsync_ms_p90": q(fs, 0.9),
                "fsync_ms_max": round(max(fs), 3) if fs else None,
                "util_med": q(ut, 0.5),
                "util_p90": q(ut, 0.9),
                "await_ms_med": q(aw, 0.5),
                "await_ms_p90": q(aw, 0.9),
                "await_ms_max": q(aw, 1.0),
            }
        )
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "probe" and len(sys.argv) >= 4:
        probe_main(
            sys.argv[2],
            sys.argv[3],
            float(sys.argv[4]) if len(sys.argv) > 4 else 5.0,
        )
    elif mode == "calib" and len(sys.argv) >= 4:
        calib_main(
            sys.argv[2],
            float(sys.argv[3]),
            float(sys.argv[4]) if len(sys.argv) > 4 else 3.0,
        )
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main()
