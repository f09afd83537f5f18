#!/usr/bin/env python
"""Instrumented encode-stage probe: separates pure-Python kernel time from
stage wall at a given core count. Usage: probe_encode.py CORES [INPUT]"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from py3dtilers_spark.session import get_spark  # noqa: E402


def main():
    cores = int(sys.argv[1])
    inp = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_input_x4_0.1"
    spark = get_spark(
        f"probe_c{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
        },
    )
    sc = spark.sparkContext
    acc_kernel = sc.accumulator(0.0)   # encode_tile time
    acc_total = sc.accumulator(0.0)    # whole gen() time incl. Arrow iteration
    acc_rows = sc.accumulator(0)

    from py3dtilers_spark.operators.kd_tree import kd_sample_walk
    from py3dtilers_spark.plans.tiler_job import ENCODED_SCHEMA, encode_tile

    feats = spark.read.parquet(inp)
    n = 2_400_000
    walk = kd_sample_walk(feats.select("x", "y"), 500, n)
    from pyspark.sql import functions as F

    todo = feats.withColumn("tile_id", walk(F.col("x"), F.col("y"))).select(
        "tile_id", "image_id", "x", "y", "z", "w", "h", "fmt", "caption", "phash", "bytes"
    )
    par = sc.defaultParallelism
    n_parts = max(2, -(-(n // 35_000 + 1) // par)) * par
    pre = todo.repartition(n_parts, "tile_id").sortWithinPartitions("tile_id")

    import numpy as np

    def gen(batches):
        t_start = time.perf_counter()
        buf = []
        cur = None

        def flush():
            t0 = time.perf_counter()
            pdf = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            out = encode_tile(pdf)
            acc_kernel.add(time.perf_counter() - t0)
            acc_rows.add(len(pdf))
            return out

        for pdf in batches:
            if len(pdf) == 0:
                continue
            tids = pdf["tile_id"].to_numpy()
            change = np.flatnonzero(tids[1:] != tids[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pdf)]))
            for s, e in zip(starts, ends):
                tid = tids[s]
                if cur is not None and tid != cur and buf:
                    yield flush()
                    buf = []
                cur = tid
                buf.append(pdf.iloc[s:e])
        if buf:
            yield flush()
        acc_total.add(time.perf_counter() - t_start)

    out_dir = f"/tmp/probe_out_c{cores}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    pre.mapInPandas(gen, ENCODED_SCHEMA).write.mode("overwrite").parquet(out_dir)
    wall = time.time() - t0
    print(
        f"cores={cores} wall={wall:.1f}s kernel_core_sec={acc_kernel.value:.1f}"
        f" gen_core_sec={acc_total.value:.1f} rows={acc_rows.value}"
        f" kernel_per_core={acc_kernel.value / cores:.1f}"
        f" gen_per_core={acc_total.value / cores:.1f}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
