"""Structured Streaming surface (engine addition — the reference is a batch
CLI with no streaming, SURVEY.md section 2.9).

The same tumbling-window aggregation as queries.q_events_window, expressed
as a streaming plan over a file source: watermarked event-time windows,
integer-unit value sums. In production the source is Kafka/Iceberg CDC; the
sandbox drives it with availableNow over the events parquet, which replays
the table through the streaming engine (incremental state store, same
result as batch — asserted in tests/test_streaming.py)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DataFrame: 1-hour tumbling windows per event_type."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # parquet carries TIMESTAMP_NTZ; watermarks need TIMESTAMP (session is
    # pinned UTC, so the instant is unchanged)
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        src.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(value * 10000.0) AS BIGINT)")).alias("value_e4"),
        )
        .select(
            F.expr("CAST(unix_timestamp(window.start) AS BIGINT)").alias("bucket"),
            "event_type",
            "n",
            "value_e4",
        )
    )


SESSION_OUT_SCHEMA = (
    "event_type string, session_start bigint, session_end bigint,"
    " n bigint, value_e4 bigint"
)
_SESSION_STATE_SCHEMA = "start long, end long, n long, val long"


def sessionize_stream(
    src: DataFrame, gap_sec: int = 21600, late_sec: int | None = None
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): gap-based
    sessionization per event_type. Events closer than `gap_sec` chain into
    one session; a session still open at the end of a micro-batch is carried
    in the group state and merged with the next batch (so sessions spanning
    micro-batch/file boundaries assemble exactly once). Closed sessions are
    appended as they are sealed.

    Two mechanisms make sure no session is silently withheld:

    - event-time timeout: every open session arms a timeout at
      session_end + gap_sec; once the stream's watermark (delay `late_sec`,
      default gap_sec; events later than that are dropped, the standard
      watermark contract) passes it, the session is emitted and the state
      dropped — a key that goes quiet never wedges its last session.
    - flush sentinels: a row with NULL ve4 is a drain marker — it both
      advances the watermark and, for its own key, immediately emits the
      carried session and clears the state. At end-of-stream the watermark
      cannot pass max_event_time - delay on its own, so drivers that need a
      complete drain (availableNow batch replays, shutdown) append one
      sentinel per key (or one far-future sentinel broadcast to all keys).

    No reference counterpart (the reference is batch-only); this is the
    engine's demonstration of arbitrary stateful logic beyond windowed aggs
    — at scale the state store shards by group key like any shuffle.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if late_sec is None:
        late_sec = gap_sec
    cols = ["event_type", "session_start", "session_end", "n", "value_e4"]

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:
            if state.exists:
                cur = tuple(int(x) for x in state.get)
                state.remove()
                yield pd.DataFrame([(key[0], *cur)], columns=cols)
            return

        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True)
        flush_req = bool(rows["ve4"].isna().any())
        rows = rows.dropna(subset=["ve4"]).sort_values("tse")
        cur = tuple(int(x) for x in state.get) if state.exists else None

        closed: list[tuple] = []
        if len(rows):
            tse = rows["tse"].to_numpy(dtype=np.int64)
            ve4 = rows["ve4"].to_numpy(dtype=np.int64)
            # a session starts at i when the gap to the previous event (or
            # to the carried-over open session's end) exceeds gap_sec
            prev_end = cur[1] if cur else tse[0] - gap_sec - 1
            prev = np.concatenate(([prev_end], tse[:-1]))
            starts = np.flatnonzero((tse - prev) > gap_sec)
            bounds = np.concatenate((starts, [len(tse)])).astype(np.int64)
            if starts.size == 0 or starts[0] != 0:
                # head run continues the open session
                head = int(bounds[0]) if starts.size else len(tse)
                cur = (
                    cur[0],
                    int(tse[head - 1]),
                    cur[2] + head,
                    cur[3] + int(ve4[:head].sum()),
                )
            for i, s in enumerate(starts):
                e = int(bounds[i + 1])
                if cur is not None:
                    closed.append((key[0], *cur))
                cur = (int(tse[s]), int(tse[e - 1]), int(e - s), int(ve4[s:e].sum()))

        if flush_req:
            if cur is not None:
                closed.append((key[0], *cur))
            if state.exists:
                state.remove()
        elif cur is not None:
            state.update(tuple(int(x) for x in cur))
            # seal once the watermark passes the earliest instant at which
            # no future event can extend this session
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((cur[1] + gap_sec) * 1000, wm + 1))
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    watermarked = src.withColumn(
        "_evt", F.col("tse").cast("timestamp")
    ).withWatermark("_evt", f"{late_sec} seconds")
    return watermarked.groupBy("event_type").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def run_stream_to_memory(spark: SparkSession, sf_dir: str, name: str = "events_out") -> DataFrame:
    """Drive the stream to completion with availableNow; returns the result
    as a batch DataFrame from the memory sink."""
    q = (
        events_stream_window(spark, sf_dir)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
