#!/usr/bin/env python
"""CO-LOCATED during-run weather probe (scaling evidence protocol v2).

Round-4 evidence (BENCH/BASELINE.md "Gate v2") showed the reserved-CPU
canary is co-TEMPORAL but not co-LOCATED: chain 20260817T141737_p2h3's
first hi run took 111.7 s (clean-window norm ~76 s) while its reserved-CPU
canary read a healthy 61.7/56.1 — weather that hits only the JOB's pinned
CPUs (host steal focused on those vCPUs, per-core frequency/memory-
bandwidth deficits) is invisible from other CPUs. This probe therefore
runs ON the job's own CPUs, concurrently with the job, and measures two
host-state signals that timesharing with the job cannot corrupt:

  cpu_tile — CPU-SECONDS per calib_kernel tile (time.process_time).
      Wall time on a shared CPU is dominated by fair-share scheduling
      against the job itself (measured: wall doubles under 1-busy-proc
      contention while cpu time moves 0.048 -> 0.053 s, i.e. +10%), so
      wall is useless co-located; CPU time is scheduler-invariant and
      inflates exactly when the silicon slows (host memory-bandwidth
      pressure, frequency caps) — the failure mode the reserved canary
      cannot see.
  steal — per-CPU steal-tick fraction from /proc/stat for THIS cpu over
      each burst interval: time the vCPU was runnable but the host ran
      someone else. Direct, co-located, zero-overhead descheduling signal
      (only meaningful on a busy CPU — idle vCPUs accrue no steal, which
      is why this must sample DURING the run).

One independent process per job CPU (duty ~2%: TILES_PER_BURST tiles of
~53 ms CPU every INTERVAL seconds); lines are O_APPEND-atomic JSON:
  {"t": ..., "cpu": 31, "cpu_tile": [s, s], "steal": frac, "warm": bool}

The per-CPU duty is identical at every parallelism level, so the probe's
(tiny) perturbation cancels in the lo/hi efficiency ratio by construction.

Usage: co_canary.py OUT_FILE CPU[,CPU...] [INTERVAL_S] [TILES_PER_BURST]
Runs until SIGTERM/SIGINT (the chain runner owns its lifetime).
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.calib_kernel import calib_tile  # noqa: E402


def _steal_total(cpu: int) -> tuple[int, int]:
    """(total_ticks, steal_ticks) for one cpu from /proc/stat."""
    tag = f"cpu{cpu} "
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                if line.startswith(tag):
                    f = [int(x) for x in line.split()[1:]]
                    return sum(f), f[7]
    except (OSError, IndexError, ValueError):
        pass
    return 0, 0


def _probe_loop(cpu: int, out_file: str, interval: float, tiles: int) -> None:
    try:
        os.sched_setaffinity(0, {cpu})
    except (AttributeError, OSError):
        pass
    stop = {"v": False}
    signal.signal(signal.SIGTERM, lambda *_: stop.update(v=True))
    signal.signal(signal.SIGINT, lambda *_: stop.update(v=True))

    fd = os.open(out_file, os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)
    prev = _steal_total(cpu)
    warm = True  # first burst pages in numpy/zlib + builds the blob cache
    while not stop["v"]:
        t0 = time.time()
        cts = []
        for i in range(tiles):
            c0 = time.process_time()
            calib_tile(i)
            cts.append(round(time.process_time() - c0, 4))
        cur = _steal_total(cpu)
        d_tot, d_st = cur[0] - prev[0], cur[1] - prev[1]
        prev = cur
        rec = {
            "t": round(t0, 2),
            "cpu": cpu,
            "cpu_tile": cts,
            "steal": round(d_st / max(d_tot, 1), 4),
        }
        if warm:
            rec["warm"] = True
            warm = False
        os.write(fd, (json.dumps(rec) + "\n").encode())
        # sleep the remainder; re-check stop every 0.5 s so SIGTERM reaps
        # promptly and no burst straddles the run boundary
        deadline = t0 + interval
        while not stop["v"] and time.time() < deadline:
            time.sleep(min(0.5, max(0.0, deadline - time.time())))
    os.close(fd)


def main() -> None:
    out_file = sys.argv[1]
    cpus = [int(c) for c in sys.argv[2].split(",")]
    interval = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0
    tiles = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    # one child per job CPU; the parent only forwards signals and reaps, so
    # a single SIGTERM to this pid (or its process group) stops every probe
    kids = []
    for cpu in cpus:
        pid = os.fork()
        if pid == 0:
            _probe_loop(cpu, out_file, interval, tiles)
            os._exit(0)
        kids.append(pid)

    stop = {"v": False}

    def _fan(_s, _f):
        stop["v"] = True
        for k in kids:
            try:
                os.kill(k, signal.SIGTERM)
            except OSError:
                pass

    signal.signal(signal.SIGTERM, _fan)
    signal.signal(signal.SIGINT, _fan)
    for k in kids:
        while True:
            try:
                os.waitpid(k, 0)
                break
            except InterruptedError:
                continue
            except OSError:
                break


if __name__ == "__main__":
    main()
