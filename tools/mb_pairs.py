#!/usr/bin/env python
"""Paired lo/hi sampling of the encode kernel: alternate 4/16-proc runs in
tight adjacency, report per-pair efficiency + medians, for each variant."""
import statistics
import subprocess
import sys
import re

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
VARIANTS = [int(v) for v in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["0", "1"])]

# single-process runner to keep malloc env per-variant clean
RUNNER = r"""
import sys, time, multiprocessing as mp
sys.path.insert(0, "/root/repo")
from tools.mb_encode_scaling import run
variant, nproc, ntasks = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
print(run(variant, nproc, ntasks))
"""

def one(variant, nproc, ntasks=32):
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(variant), str(nproc), str(ntasks)],
        capture_output=True, text=True, check=True)
    return float(out.stdout.strip().splitlines()[-1])

for v in VARIANTS:
    effs = []
    for r in range(REPS):
        lo = one(v, 4)
        hi = one(v, 16)
        eff = hi / lo / 4.0
        effs.append(eff)
        print(f"v{v} pair{r}: lo={lo:6.2f} hi={hi:6.2f} eff={eff:.3f}", flush=True)
    print(f"v{v} median eff = {statistics.median(effs):.3f}  max = {max(effs):.3f}")
