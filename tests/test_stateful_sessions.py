"""Custom stateful streaming operator (SURVEY 2.9 engine surface):
gap sessionization via applyInPandasWithState, including sessions that
span micro-batch boundaries (carried in group state)."""
import time

import pandas as pd

from py3dtilers_spark.streaming.events import sessionize_stream

GAP = 6 * 3600


def _batch_sessions(pdf: pd.DataFrame):
    """Reference sessionization in plain python over the full data."""
    out = []
    for et, g in pdf.groupby("event_type"):
        g = g.sort_values("tse")
        cur = None
        for tse, ve4 in zip(g["tse"], g["ve4"]):
            if cur is not None and tse - cur[2] <= GAP:
                cur = (et, cur[1], tse, cur[3] + 1, cur[4] + ve4)
            else:
                if cur is not None:
                    out.append(cur)
                cur = (et, tse, tse, 1, ve4)
        out.append((*cur, "open"))
    closed = {c[:5] for c in out if len(c) == 5}
    last_open = {c[:5] for c in out if len(c) == 6}
    return closed, last_open


def test_sessionize_stream_matches_batch(spark, sf_smoke, tmp_path):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").selectExpr(
        "event_type",
        "CAST(unix_timestamp(CAST(ts AS TIMESTAMP)) AS LONG) AS tse",
        "CAST(round(value * 10000.0) AS LONG) AS ve4",
    )
    pdf = ev.toPandas()
    d = tmp_path / "ev"
    d.mkdir()
    mid = pdf["tse"].median()
    # two time-ordered files with distinct mtimes -> two micro-batches, so
    # sessions crossing the boundary must be stitched through group state
    pdf[pdf["tse"] <= mid].to_parquet(d / "a.parquet", index=False)
    time.sleep(1.1)
    pdf[pdf["tse"] > mid].to_parquet(d / "b.parquet", index=False)
    time.sleep(1.1)
    # drain: one NULL-ve4 sentinel per key, far enough in the future to push
    # the watermark past every open session's timeout
    sentinel = pd.DataFrame(
        {
            "event_type": sorted(pdf["event_type"].unique()),
            "tse": int(pdf["tse"].max()) + GAP * 10,
            "ve4": pd.array([None] * pdf["event_type"].nunique(), dtype="Int64"),
        }
    )
    sentinel.to_parquet(d / "c.parquet", index=False)

    src = (
        spark.readStream.schema("event_type string, tse long, ve4 long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        sessionize_stream(src, gap_sec=GAP)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sess_test").toPandas()
    got_set = {
        (r["event_type"], r["session_start"], r["session_end"], r["n"], r["value_e4"])
        for _, r in got.iterrows()
    }
    expected_closed, last_open = _batch_sessions(pdf)
    # with the sentinel drain EVERY session is emitted exactly once —
    # including each key's trailing open session
    assert len(got) == len(got_set)  # no double emission
    assert got_set == expected_closed | last_open
    assert len(expected_closed) > 10  # real coverage, not a trivial pass
