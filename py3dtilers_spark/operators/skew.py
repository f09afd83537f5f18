"""Skew handling for hot spatial cells (north-rule requirement: "skew from
dense urban cells is handled by salted repartitioning on H3 cell + AQE
skew-join splitting").

Two explicit mechanisms on top of the session-level AQE skew-join config
(session.py:35-37):

- `salted_join`: replicate the small/dim side SALT times (one explode of a
  sequence literal — dim stays broadcast-sized) and give every fact row a
  deterministic salt from its unique id; the join key becomes (key, salt),
  so one hot key (a dense city cell: millions of features in one H3 cell)
  spreads across SALT reducers instead of one straggler task. Result set
  is IDENTICAL to the unsalted join (oracle-checked: `skew_join_salted`).

- `salted_two_stage_agg`: groupBy (key, salt) partial -> groupBy key final,
  for aggregations whose per-key state is large (collect_list/set shapes
  where Catalyst's map-side partial combine doesn't bound reducer skew).

The reference has no counterpart — it is single-threaded, so a dense cell
is merely slow there (SURVEY.md section on skew, line 306).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⨝dim on `key` with `n_salt`-way salt spreading.

    salt_src: a unique-ish fact column hashed into the deterministic salt
    (xxhash64 so replays are stable). The dim side is exploded n_salt ways
    BEFORE the join; pass a broadcast-sized dim."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salt - 1})"))
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")


def salted_two_stage_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    salt_src: str,
    n_salt: int = 8,
) -> DataFrame:
    """Two-stage skew-proof aggregation: stage 1 aggregates per
    (key, salt), stage 2 merges per key. aggs maps output column ->
    one of 'count' | 'sum:<col>' | 'min:<col>' | 'max:<col>'."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)).cast("int")
    )
    stage1_exprs, stage2_exprs = [], []
    for out, spec in aggs.items():
        if spec == "count":
            stage1_exprs.append(F.count(F.lit(1)).alias(out))
            stage2_exprs.append(F.sum(out).alias(out))
        else:
            op, col = spec.split(":", 1)
            stage1_exprs.append(getattr(F, op)(col).alias(out))
            merge = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            stage2_exprs.append(merge(out).alias(out))
    partial = salted.groupBy(*key_cols, "_salt").agg(*stage1_exprs)
    return partial.groupBy(*key_cols).agg(*stage2_exprs)
