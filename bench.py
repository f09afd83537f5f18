#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus the north-rule scaling proxy (same job at
N and 4N cores -> throughput scaling efficiency). Prints ONE JSON line.
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
LO_CPUS = max(1, CPUS // 4)

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
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _scaling_job(spark, sf_dir: str, out_root: str, tag: str) -> dict:
    """The flagship pipeline (payload encode included) — the job whose
    throughput is measured at both parallelism levels."""
    out = os.path.join(out_root, tag)
    t0 = time.time()
    stats = run_tiler(
        spark, sf_dir, out, kd_tree_max=500, exact=False, with_payload=True,
        run_id=f"bench_{tag}",
    )
    dt = time.time() - t0
    return {"sec": dt, **stats}


def main() -> None:
    out_root = tempfile.mkdtemp(prefix="bench_tiles_")
    queries: dict[str, float] = {}
    timings: dict = {}

    # --- phase 1: scaling proxy at N/4 cores (fresh session, small master)
    spark_lo = get_spark("bench_lo", cores=LO_CPUS, shuffle_partitions=LO_CPUS)
    lo = _scaling_job(spark_lo, SF_DIR, out_root, f"lo{LO_CPUS}")
    spark_lo.stop()

    # --- phase 2: everything else at full cores
    spark = get_spark("bench_hi", cores=CPUS, shuffle_partitions=CPUS)
    hi = _scaling_job(spark, SF_DIR, out_root, f"hi{CPUS}")

    for name in HEADLINE:
        fn, _ = QUERIES[name]
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        queries[name] = round(time.time() - t0, 3)
        timings[name + "_rows"] = n

    total = round(sum(queries.values()) + hi["sec"], 3)
    queries["tiler_pipeline"] = round(hi["sec"], 3)

    thr_lo = lo["n_features"] / lo["sec"]
    thr_hi = hi["n_features"] / hi["sec"]
    # ideal speedup = CPUS/LO_CPUS; efficiency = actual/ideal
    efficiency = (thr_hi / thr_lo) / (CPUS / LO_CPUS)

    result = {
        "metric": "wall_sec_headline_suite",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "tiles_per_sec": round(hi["n_tiles"] / hi["sec"], 3),
        "features_per_sec": round(thr_hi, 1),
        "scaling": {
            "cores_lo": LO_CPUS,
            "cores_hi": CPUS,
            "sec_lo": round(lo["sec"], 3),
            "sec_hi": round(hi["sec"], 3),
            "features_per_sec_lo": round(thr_lo, 1),
            "features_per_sec_hi": round(thr_hi, 1),
            "efficiency": round(efficiency, 3),
        },
    }
    spark.stop()
    shutil.rmtree(out_root, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
