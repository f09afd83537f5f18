#!/usr/bin/env python
"""During-run host-weather canary (scaling evidence protocol, round 4).

Runs CONCURRENTLY with each lo/hi scaling measurement: every INTERVAL
seconds it bursts 2*N_PROCS bare tile-kernel encodes (tools/calib_kernel.py
— the job's own per-tile work, no Spark) across an N_PROCS pool pinned to
RESERVED CPUs (disjoint from the job's pinned set), and appends one JSON
line {t, burst_sec, tps} per burst to OUT_FILE. Duty cycle ~2-4%, so the
probe itself is invisible in the job's wall clock.

Why: the round-3 record proved a 30 s pre/post kernel burst cannot attribute
a 5-minute Spark run's window — the host (a shared, memory-ballooned VM)
drifts WITHIN runs. This canary sees exactly the weather the job saw,
sampled for the run's entire duration; bench.py gates each run on the
canary's during-run throughput series (tools/run_chain.py:RUN_CLEAN rule).

Usage: canary.py N_PROCS OUT_FILE [INTERVAL_S] [CPU_BASE]
Runs until SIGTERM/SIGINT (the chain runner owns its lifetime).
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.calib_kernel import calib_tile  # noqa: E402


def main() -> None:
    n_procs = int(sys.argv[1])
    out_file = sys.argv[2]
    interval = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    cpu_base = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    # reserved CPUs: the job pins to the TOP of the range (scaling_run.py),
    # cpu0 carries host softirq — the canary sits in the middle
    try:
        os.sched_setaffinity(0, set(range(cpu_base, cpu_base + n_procs)))
    except (AttributeError, OSError):
        pass

    stop = {"v": False}

    def _sig(_s, _f):
        stop["v"] = True

    signal.signal(signal.SIGTERM, _sig)
    signal.signal(signal.SIGINT, _sig)

    ntiles = 2 * n_procs
    with mp.Pool(n_procs) as pool, open(out_file, "a", buffering=1) as fh:
        # warmup burst: page in numpy/zlib + build the blob cache; recorded
        # with warm=true and excluded from the gate by the analyzer
        t0 = time.time()
        pool.map(calib_tile, range(ntiles), chunksize=1)
        dt = time.time() - t0
        fh.write(json.dumps(
            {"t": round(t0, 2), "burst_sec": round(dt, 4),
             "tps": round(ntiles / dt, 2), "warm": True}) + "\n")
        while not stop["v"]:
            time.sleep(max(0.0, interval - dt))
            if stop["v"]:
                break
            t0 = time.time()
            pool.map(calib_tile, range(ntiles), chunksize=1)
            dt = time.time() - t0
            fh.write(json.dumps(
                {"t": round(t0, 2), "burst_sec": round(dt, 4),
                 "tps": round(ntiles / dt, 2)}) + "\n")


if __name__ == "__main__":
    main()
