#!/usr/bin/env python
"""Extra (non-driver) benchmarks: noop-sink phase isolation for the tiler
pipeline (guide section 1.4) — times each stage of the scaling job's
encode path without paying for the sink, so the shuffle and the Python
boundary are attributable separately. NOT part of the frozen bench.py
contract; numbers are cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [CORES] [INPUT_PARQUET]
(default 4 cores, the materialized bench input; pins like scaling_run.py).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    input_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/bench_input_x3_0.1"
    )
    try:
        ncpu = os.cpu_count() or cores
        os.sched_setaffinity(0, set(range(ncpu - cores, ncpu)))
    except (AttributeError, OSError):
        pass

    from pyspark.sql import functions as F

    from py3dtilers_spark.operators.kd_tree import kd_sample_walk
    from py3dtilers_spark.plans.tiler_job import encode_tiles_stream
    from py3dtilers_spark.session import get_spark

    spark = get_spark(
        f"bench_extra_c{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1 * 1024 * 1024),
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
        },
    )
    src = spark.read.parquet(input_path)
    n_rows = src.count()
    slim_cols = ["image_id", "x", "y", "z", "w", "h", "fmt", "caption", "phash"]
    walk = kd_sample_walk(src.select("x", "y"), 500, n_rows)
    todo = src.withColumn("tile_id", walk(F.col("x"), F.col("y"))).select(
        "tile_id", *slim_cols, "bytes"
    )
    par = spark.sparkContext.defaultParallelism
    n_parts = max(2, -(-(n_rows // 35000 + 1) // par)) * par
    sc = spark.sparkContext

    def timed(label, df):
        sc.setJobDescription(label)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"{label}: {dt:.1f}s")
        sc.setJobDescription(None)
        return dt

    timed("scan+assign (noop)", todo)
    pre = todo.repartition(n_parts, "tile_id").sortWithinPartitions("tile_id")
    timed("scan+shuffle+sort (noop)", pre)
    timed("scan+shuffle+sort+encode (noop)", encode_tiles_stream(pre, None))
    spark.stop()


if __name__ == "__main__":
    main()
