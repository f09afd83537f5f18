#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the north-rule scaling proxy — the full
tiling pipeline on an amplified input at N and 4N cores (default 4 vs 16)
with throughput scaling efficiency. Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py3dtilers_spark.queries import QUERIES  # noqa: E402
from py3dtilers_spark.plans.tiler_job import run_tiler  # noqa: E402
from py3dtilers_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# N vs 4N cores for the scaling pair ("two cluster sizes" proxy). N defaults
# to 4 so the 4N run still has machine headroom and the parallel fraction
# dominates the fixed driver cost at sandbox data sizes.
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
SCALE_COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "8"))

HEADLINE = [
    "kd_tiles",
    "groups_cube",
    "pip_first_match",
    "knn_block",
    "star_join_agg",
    "cube_groupby",
    "ngram_jaccard",
    "ann_cosine_topk",
    "events_window",
    "dedup_exact",
    "minhash_lsh_pairs",
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _scaling_job(cores: int, out_root: str) -> dict:
    """Full pipeline (payload encode + lineage + manifest) on the amplified
    input; fresh session per parallelism level. Same input both levels."""
    from py3dtilers_spark.data.features import features_amplified

    spark = get_spark(f"bench_c{cores}", cores=cores, shuffle_partitions=cores)
    out = os.path.join(out_root, f"c{cores}")
    feats = features_amplified(spark, SF_DIR, SCALE_COPIES)
    t0 = time.time()
    stats = run_tiler(
        spark, SF_DIR, out, kd_tree_max=2000, exact=False, with_payload=True,
        run_id=f"bench_c{cores}", features=feats,
    )
    dt = time.time() - t0
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    return {"sec": dt, **stats}


def _machine_calibration(n_lo: int, n_hi: int) -> dict:
    """Pure-CPU multiprocess throughput at the two parallelism levels —
    measures what the (virtualized) HOST actually delivers going N -> 4N
    processes, independent of Spark. The job's scaling efficiency is
    reported both raw and normalized by this hardware ceiling."""
    import multiprocessing as mp
    import zlib

    import numpy as np

    _ = zlib
    buf = np.random.default_rng(42).integers(0, 255, 4 << 20, dtype=np.uint8).tobytes()
    out = {}
    for n in (n_lo, n_hi):
        with mp.Pool(n) as p:
            p.map(_calib_warm, range(n))
            t0 = time.time()
            p.starmap(_calib_work, [(buf,)] * (n * 2))
            out[n] = (n * 2) / (time.time() - t0)
    return {
        "tasks_per_sec_lo": round(out[n_lo], 2),
        "tasks_per_sec_hi": round(out[n_hi], 2),
        "machine_efficiency": round((out[n_hi] / out[n_lo]) / (n_hi / n_lo), 3),
    }


def _calib_warm(_):
    return 0


def _calib_work(buf):
    import zlib

    for _ in range(6):
        zlib.compress(buf, 1)
    return 0


def main() -> None:
    out_root = tempfile.mkdtemp(prefix="bench_tiles_")
    queries: dict[str, float] = {}

    calib = _machine_calibration(SCALE_N, 4 * SCALE_N)
    lo = _scaling_job(SCALE_N, out_root)
    hi = _scaling_job(4 * SCALE_N, out_root)

    spark = get_spark("bench_queries", cores=CPUS, shuffle_partitions=CPUS)
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        queries[name] = round(time.time() - t0, 3)
    spark.stop()

    total = round(sum(queries.values()) + hi["sec"], 3)
    queries[f"tiler_pipeline_x{SCALE_COPIES}_c{4 * SCALE_N}"] = round(hi["sec"], 3)

    thr_lo = lo["n_features"] / lo["sec"]
    thr_hi = hi["n_features"] / hi["sec"]
    efficiency = (thr_hi / thr_lo) / 4.0

    result = {
        "metric": "wall_sec_headline_suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "tiles_per_sec": round(hi["n_tiles"] / hi["sec"], 3),
        "features_per_sec": round(thr_hi, 1),
        "scaling": {
            "cores_lo": SCALE_N,
            "cores_hi": 4 * SCALE_N,
            "amplified_rows": hi["n_features"],
            "sec_lo": round(lo["sec"], 3),
            "sec_hi": round(hi["sec"], 3),
            "features_per_sec_lo": round(thr_lo, 1),
            "features_per_sec_hi": round(thr_hi, 1),
            "efficiency": round(efficiency, 3),
            "machine_calibration": calib,
            "efficiency_normalized": round(
                min(1.0, efficiency / max(calib["machine_efficiency"], 1e-9)), 3
            ),
            "timings_hi": hi.get("timings", {}),
        },
    }
    shutil.rmtree(out_root, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
