"""Approximate nearest neighbors over the embeddings table.

Two paths (engine additions for training-data pipelines):
- brute-force cosine top-k (queries.q_ann_cosine) — the correctness baseline;
  broadcast query set x full scan, fold-based dot products.
- banded LSH (this module) — the 100 TB path: 16 random-hyperplane sign bits
  split into 2 bands of 8; a row is a candidate for a query iff they share
  ANY band bucket (multi-band recall, the same band trick as MinHash LSH).
  Candidates are deduped and reranked by exact cosine. Hyperplanes are
  seed-stable literals embedded in both the Spark plan and the DuckDB
  oracle, so results are bit-identical.

Scale shape: the probe side joins the corpus with a plain shuffle equi-join
on (band, bkey) — no broadcast of the query side (1% of a 10^9-row corpus
would blow any broadcast budget); Catalyst/AQE still picks broadcast when
the query side IS small. Bucket space = 2 bands x 2^8 keys per band at this
dimensionality — band width (bits per band) is the recall/cost dial, and
AQE skew-split bounds hot buckets.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 16
N_BANDS = 2
BAND_BITS = N_PLANES // N_BANDS
DIM = 64


def _planes(n_planes: int = N_PLANES) -> np.ndarray:
    """Seed-stable +/-1 hyperplanes (embedded as literals both engines).
    Parametric in count: widening the bands (more planes) reuses the same
    xorshift stream, so plane p is identical at every width."""
    vals = np.empty((n_planes, DIM), dtype=np.float64)
    state = 88172645463325252
    for p in range(n_planes):
        for i in range(DIM):
            # xorshift64 — plain integer arithmetic, reproducible anywhere
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            vals[p, i] = 1.0 if state % 2 == 0 else -1.0
    return vals


PLANES = _planes()


def lsh_band_bits(n_rows: int, target_bucket_rows: int = 4096) -> int:
    """The band-width dial, as code: bits per band such that the EXPECTED
    bucket occupancy n_rows / 2^bits stays near target_bucket_rows. At
    sf0.01 (~6k vectors) this floors at the default 8 bits — bit-identical
    to the static oracle — and at 10^9 rows it widens to ~18 bits, keeping
    the per-bucket candidate expansion bounded instead of quadratic."""
    import math

    if n_rows <= target_bucket_rows:
        return BAND_BITS
    return max(BAND_BITS, min(24, math.ceil(math.log2(n_rows / target_bucket_rows))))


def _plane_array_sql(p: int) -> str:
    return "[" + ", ".join(f"{v:.1f}" for v in PLANES[p]) + "]"


def _spark_band_expr(band: int, band_bits: int = BAND_BITS, planes: np.ndarray | None = None) -> str:
    planes = PLANES if planes is None else planes
    bits = []
    for j in range(band_bits):
        p = band * band_bits + j
        arr = "array(" + ", ".join(f"{v:.1f}D" for v in planes[p]) + ")"
        dot = f"aggregate(zip_with(e, {arr}, (a, b) -> a * b), 0.0D, (acc, v) -> acc + v)"
        bits.append(f"(CASE WHEN {dot} >= 0.0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def _duck_band_expr(band: int) -> str:
    bits = []
    for j in range(BAND_BITS):
        p = band * BAND_BITS + j
        dot = f"list_dot_product(e, {_plane_array_sql(p)}::DOUBLE[])"
        bits.append(f"(CASE WHEN {dot} >= 0.0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def ann_lsh_topk(
    emb: DataFrame, query_mod: int = 100, k: int = 5, band_bits: int | None = None
) -> DataFrame:
    """(q_id, rk, neighbor_id) — exact cosine rerank over multi-band LSH
    candidates (any shared band bucket).

    band_bits widens the bucket space for large corpora (see lsh_band_bits);
    None keeps the default 8 — callers at scale pass
    ``band_bits=lsh_band_bits(corpus_rows)``."""
    bb = band_bits or BAND_BITS
    planes = _planes(N_BANDS * bb) if bb != BAND_BITS else PLANES
    band_arr = "array(" + ", ".join(
        _spark_band_expr(b, bb, planes) for b in range(N_BANDS)
    ) + ")"
    flat = (
        emb.selectExpr("vec_id", "transform(embedding, v -> CAST(v AS DOUBLE)) AS e")
        .selectExpr(
            "vec_id", "e",
            "sqrt(aggregate(e, 0.0D, (acc, v) -> acc + v * v)) AS nrm",
            f"posexplode({band_arr}) AS (band, bkey)",
        )
    )
    q = flat.where(f"vec_id % {query_mod} = 0").selectExpr(
        "band", "bkey", "vec_id AS q_id", "e AS qe", "nrm AS qn"
    )
    cand = (
        flat.join(q, ["band", "bkey"])
        .where("vec_id <> q_id")
        .dropDuplicates(["q_id", "vec_id"])  # pair may share both bands
    )
    scored = cand.selectExpr(
        "q_id", "vec_id",
        "aggregate(zip_with(e, qe, (a, b) -> a * b), 0.0D, (acc, v) -> acc + v)"
        " / (nrm * qn) AS cos_sim",
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(f"rk <= {k}")
        .select("q_id", "rk", F.col("vec_id").alias("neighbor_id"))
    )


def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.30) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH band blocking (any shared band
    bucket) + exact cosine verify >= threshold. The all-pairs O(N^2) join
    never exists — candidates come from the banded buckets, the exact dot
    product reranks only those. Returns (vec_a, vec_b, n_shared_bands).

    Recall is the standard banded-LSH curve (band bits vs similarity); at
    10^12 rows the dial is more/narrower bands, same plan shape."""
    band_arr = "array(" + ", ".join(
        _spark_band_expr(b) for b in range(N_BANDS)
    ) + ")"
    flat = (
        emb.selectExpr("vec_id", "transform(embedding, v -> CAST(v AS DOUBLE)) AS e")
        .selectExpr(
            "vec_id", "e",
            "sqrt(aggregate(e, 0.0D, (acc, v) -> acc + v * v)) AS nrm",
            f"posexplode({band_arr}) AS (band, bkey)",
        )
    )
    a = flat.selectExpr("band", "bkey", "vec_id AS vec_a", "e AS ea", "nrm AS na")
    b = flat.selectExpr("band", "bkey", "vec_id AS vec_b", "e AS eb", "nrm AS nb")
    cand = (
        a.join(b, ["band", "bkey"])
        .where("vec_a < vec_b")
        .groupBy("vec_a", "vec_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_bands"),
            F.first("ea").alias("ea"), F.first("na").alias("na"),
            F.first("eb").alias("eb"), F.first("nb").alias("nb"),
        )
    )
    return cand.where(
        F.expr(
            "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
            f" / (na * nb) >= {threshold}"
        )
    ).select("vec_a", "vec_b", "n_shared_bands")


def embedding_dup_oracle_sql(threshold: float = 0.30) -> str:
    flat_rows = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, e, nrm, {b} AS band, {_duck_band_expr(b)} AS bkey FROM bucketed"
        for b in range(N_BANDS)
    )
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), bucketed AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM base
), flat AS (
{flat_rows}
), cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, count(*) AS n_shared_bands,
         any_value(a.e) AS ea, any_value(a.nrm) AS na,
         any_value(b.e) AS eb, any_value(b.nrm) AS nb
  FROM flat a JOIN flat b ON a.band = b.band AND a.bkey = b.bkey
                         AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT vec_a, vec_b, n_shared_bands
FROM cand
WHERE list_dot_product(ea, eb) / (na * nb) >= {threshold}
"""


def ann_lsh_oracle_sql(query_mod: int = 100, k: int = 5) -> str:
    flat_rows = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, e, nrm, {b} AS band, {_duck_band_expr(b)} AS bkey FROM bucketed"
        for b in range(N_BANDS)
    )
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), bucketed AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM base
), flat AS (
{flat_rows}
), q AS (
  SELECT band, bkey, vec_id AS q_id, e AS qe, nrm AS qn
  FROM flat WHERE vec_id % {query_mod} = 0
), cand AS (
  SELECT DISTINCT f.vec_id, f.e, f.nrm, q.q_id, q.qe, q.qn
  FROM flat f JOIN q USING (band, bkey)
  WHERE f.vec_id <> q.q_id
)
SELECT q_id,
       CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY list_dot_product(e, qe) / (nrm * qn) DESC, vec_id) AS INT) AS rk,
       vec_id AS neighbor_id
FROM cand
QUALIFY rk <= {k}
"""


# --- IVF (inverted-file) ANN: the second scale path ------------------------
#
# LSH's bucket space is fixed by the plane count; IVF's is data-adaptive —
# a coarse quantizer (k-means on a bounded sample) splits the corpus into
# n_centroids cells, each vector indexed ONCE under its nearest centroid,
# and a query probes only its `nprobe` nearest cells. At 10^9+ rows the
# centroid count (and nprobe) is the recall/cost dial; the assignment pass
# is one Arrow-batched matmul over the scan, the candidate join a plain
# shuffle equi-join on the cell id — same plan family as every other
# bucketed op in the engine, no broadcast of the big side anywhere.


def _lloyd(x: np.ndarray, n_centroids: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd iterations: init = first k rows (caller fixes
    row order), unit-normalized so assignment maximizes cosine via dot."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cent = x[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_train_centroids(
    emb: DataFrame, n_centroids: int = 16, sample_cap: int = 4096, iters: int = 8
) -> np.ndarray:
    """Deterministic coarse quantizer: a hash-ordered sample (bounded at
    `sample_cap` rows — constant driver memory at ANY corpus size, and an
    unbiased subset because xxhash64 order is data-position-free), re-sorted
    by vec_id so the k-means init does not depend on which engine drew the
    sample — ivf_centroids_from_parquet reproduces these centroids exactly
    whenever the corpus fits the cap (the oracle-gate regime)."""
    sample = (
        emb.selectExpr(
            "vec_id", "transform(embedding, v -> CAST(v AS DOUBLE)) AS e"
        )
        .orderBy(F.xxhash64("vec_id"))
        .limit(sample_cap)
        .collect()
    )
    sample = sorted(sample, key=lambda r: r.vec_id)
    x = np.array([r.e for r in sample], dtype=np.float64)
    return _lloyd(x, n_centroids, iters)


def ivf_centroids_from_parquet(
    path: str, n_centroids: int = 16, sample_cap: int = 4096, iters: int = 8
) -> "np.ndarray | None":
    """Spark-free twin of ivf_train_centroids for oracle-SQL generation:
    valid only when the whole table fits the sample cap (then both trainers
    see the identical vec_id-sorted row set). Returns None beyond the cap."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    if tbl.num_rows > sample_cap:
        return None
    pdf = tbl.to_pandas().sort_values("vec_id")
    x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    return _lloyd(x, n_centroids, iters)


def ann_ivf_oracle_sql(
    cent: np.ndarray, query_mod: int = 100, k: int = 5, nprobe: int = 4
) -> str:
    """DuckDB oracle for ann_ivf_topk with the TRAINED centroid matrix
    embedded as literals (the same device the LSH oracle uses for its
    hyperplanes): assignment = argmax dot(e, c) (ties -> lowest cid, the
    np.argmax rule), probe = top-nprobe cells, exact cosine rerank over
    cell-joined candidates."""
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(v)) for v in cent[i])
        )
        for i in range(len(cent))
    )
    return f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), bucketed AS (
  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM base
), cents AS (
  SELECT * FROM (VALUES {rows}) t(cid, c)
), scoredc AS (
  SELECT b.vec_id, b.e, b.nrm, c.cid, list_dot_product(b.e, c.c) AS s
  FROM bucketed b CROSS JOIN cents c
), ranked AS (
  SELECT vec_id, e, nrm, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS r
  FROM scoredc
), corpus AS (
  SELECT vec_id, e, nrm, cid AS cell FROM ranked WHERE r = 1
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn, cid AS cell
  FROM ranked WHERE r <= {nprobe} AND vec_id % {query_mod} = 0
), cand AS (
  SELECT DISTINCT f.vec_id, f.e, f.nrm, q.q_id, q.qe, q.qn
  FROM corpus f JOIN q USING (cell)
  WHERE f.vec_id <> q.q_id
)
SELECT q_id,
       CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY list_dot_product(e, qe) / (nrm * qn) DESC, vec_id) AS INT) AS rk,
       vec_id AS neighbor_id
FROM cand
QUALIFY rk <= {k}
"""


def ann_ivf_topk(
    emb: DataFrame,
    query_mod: int = 100,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """(q_id, rk, neighbor_id, cos_sim) — exact cosine rerank over the
    IVF candidate set (corpus cell == any of the query's nprobe cells)."""
    from pyspark.sql.types import ArrayType, LongType

    cent = ivf_train_centroids(emb, n_centroids)

    # assignment ranks by UNnormalized dot(e, c): centroids are unit-norm so
    # the ranking equals cosine, and the oracle SQL computes the identical
    # expression (list_dot_product(e, c)) — no normalize step whose rounding
    # could flip near-ties between the engines. Ties -> lowest cid in both
    # (np.argmax first-max rule / ORDER BY s DESC, cid).
    @F.pandas_udf(LongType())
    def _cell(es: pd.Series) -> pd.Series:
        x = np.array(es.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(x @ cent.T, axis=1).astype(np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def _probe(es: pd.Series) -> pd.Series:
        x = np.array(es.tolist(), dtype=np.float64)
        top = np.argsort(-(x @ cent.T), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(top.astype(np.int64)))

    base = emb.selectExpr(
        "vec_id", "transform(embedding, v -> CAST(v AS DOUBLE)) AS e"
    ).selectExpr(
        "vec_id", "e", "sqrt(aggregate(e, 0.0D, (acc, v) -> acc + v * v)) AS nrm"
    )
    corpus = base.withColumn("cell", _cell(F.col("e")))
    q = (
        base.where(f"vec_id % {query_mod} = 0")
        .withColumn("cell", F.explode(_probe(F.col("e"))))
        .selectExpr("cell", "vec_id AS q_id", "e AS qe", "nrm AS qn")
    )
    cand = corpus.join(q, "cell").where("vec_id <> q_id")
    scored = cand.selectExpr(
        "q_id", "vec_id",
        "aggregate(zip_with(e, qe, (a, b) -> a * b), 0.0D, (acc, v) -> acc + v)"
        " / (nrm * qn) AS cos_sim",
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(f"rk <= {k}")
        .select("q_id", "rk", F.col("vec_id").alias("neighbor_id"))
    )
