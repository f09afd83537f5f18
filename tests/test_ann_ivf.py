"""IVF ANN: determinism + recall against the exact brute-force baseline."""
from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def _brute_topk(spark, k=5, query_mod=100):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.selectExpr(
        "vec_id", "transform(embedding, v -> CAST(v AS DOUBLE)) AS e"
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.e for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    out = {}
    for qi in np.where(ids % query_mod == 0)[0]:
        sims = x @ x[qi]
        sims[qi] = -2
        order = np.lexsort((ids, -sims))[:k]
        out[int(ids[qi])] = set(int(ids[o]) for o in order)
    return out


def test_ivf_recall_and_determinism(spark):
    from py3dtilers_spark.operators.ann import ann_ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = ann_ivf_topk(emb, nprobe=10).collect()
    got2 = ann_ivf_topk(emb, nprobe=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))  # deterministic

    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.q_id, set()).add(r.neighbor_id)
    truth = _brute_topk(spark)
    assert set(by_q) == set(truth)
    hits = sum(len(by_q[q] & truth[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    recall = hits / total
    # The synthetic embeddings are ISOTROPIC (no cluster structure) — the
    # worst case for IVF: neighbors spread over many Voronoi cells, so a
    # high nprobe (10/16) is needed here where clustered real embeddings
    # would reach the same recall at 2-3 probes. Measured sweep on this
    # fixture: nprobe 4 -> 0.56, 8 -> 0.76, 10 -> 0.92, 12 -> 1.0.
    assert recall >= 0.85, f"recall@5 = {recall:.3f}"


def test_ivf_nprobe_full_is_exact(spark):
    """Probing EVERY cell degrades IVF to exact search: must equal brute."""
    from py3dtilers_spark.operators.ann import ann_ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = ann_ivf_topk(emb, n_centroids=8, nprobe=8).collect()
    by_q: dict[int, set] = {}
    for r in got:
        by_q.setdefault(r.q_id, set()).add(r.neighbor_id)
    assert by_q == _brute_topk(spark)


def test_lsh_band_bits_dial(spark):
    """The band-width dial: floors at 8 (bit-identical to the static
    oracle) and widens with corpus size; a widened run still returns a
    valid deterministic top-k subset."""
    from py3dtilers_spark.operators.ann import ann_lsh_topk, lsh_band_bits

    assert lsh_band_bits(1000) == 8
    assert lsh_band_bits(10**6) == 8
    assert lsh_band_bits(10**9) == 18
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    wide = ann_lsh_topk(emb, band_bits=10).collect()
    wide2 = ann_lsh_topk(emb, band_bits=10).collect()
    assert sorted(map(tuple, wide)) == sorted(map(tuple, wide2))
    # wider bands -> fewer candidates -> recall can only shrink; every pair
    # returned must still be a genuine (q, neighbor) with rk 1..5
    assert all(1 <= r.rk <= 5 for r in wide)
