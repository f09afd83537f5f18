"""dense_index regression tests.

The range-exchange-reuse hazard (see operators/indexing.py comment and
kd_rank._rank_step): `local` = repartitionByRange + spark_partition_id
feeds TWO consumers (counts->offsets and the final join). If the physical
exchange is not reused, each consumer re-samples the range bounds and the
_pid values disagree across the join -> silently wrong dense ids. Small
inputs mask it (everything lands in one partition), so these tests use a
few thousand rows across many range partitions and check the ids against
the sorted oracle exactly.
"""
import numpy as np

from py3dtilers_spark.operators.indexing import dense_index


def _df(spark, n, seed):
    rng = np.random.default_rng(seed)
    keys = [f"k{v:09d}" for v in rng.permutation(n * 7)[:n]]
    return spark.createDataFrame([(k,) for k in keys], ["k"]), keys


def test_dense_index_consumers_agree(spark):
    df, keys = _df(spark, 5000, seed=13)
    out = dense_index(df, ["k"], "idx", num_partitions=32)
    got = {r["k"]: r["idx"] for r in out.collect()}
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


def test_dense_index_base_and_repeat_runs(spark):
    """Two separate executions of the same dense_index result must agree
    with each other (spark_partition_id is nondeterministic -- only the
    materialization in dense_index makes the result stable)."""
    df, keys = _df(spark, 3000, seed=29)
    out = dense_index(df, ["k"], "idx", base=1, num_partitions=32)
    a = {r["k"]: r["idx"] for r in out.collect()}
    b = {r["k"]: r["idx"] for r in out.collect()}
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert a == want
    assert b == want
