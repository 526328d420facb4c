"""Streaming sessionization + incremental entity aggregates.

The batch engine sessionizes with a cumulative gap-flag sum
(operators/window.py W9); the streaming form is Spark's native
``session_window`` with a watermark bounding state for late data — the
same gap semantics, incremental state instead of a sort.

These run with any streaming source; tests use a file source with
``trigger(availableNow=True)`` so results are deterministic and the
query drains and stops — the batch-equivalence check asserts the
streaming session aggregates equal the batch sessionize() output.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def state_partitions(spark: SparkSession, n: int):
    """Pin the STATE partition count for a stateful streaming query
    started inside the block.

    Spark reads ``spark.sql.shuffle.partitions`` at the first
    micro-batch's planning, freezes it into the checkpoint, and every
    state-store instance (one per partition) pays a fixed open + commit
    + snapshot cost per micro-batch — so a batch-oriented session
    default silently taxes small/medium streams: draining the sf0.1
    events table (~600k rows) through dropDuplicatesWithinWatermark
    measured 24.7 s at 32 state partitions vs 5.4 s at 8 (4.6x; the
    RocksDB provider at 32 still paid 20.5 s — the overhead is
    per-partition, not per-provider).  Size ``n`` to STATE VOLUME:
    each partition's state must fit an executor's memory, so a
    10^12-row backfill wants thousands of partitions and this sandbox's
    gate wants single digits.  The batch conf is restored on exit;
    queries already running keep their checkpoint-pinned value.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(n)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: float,
    entity: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(entity, session) aggregates over a streaming DataFrame.

    Watermark bounds the session state: events later than ``watermark``
    behind the max seen event time are dropped — the streaming analog of
    the batch engine's zero-leakage ordering.
    """
    gap = f"{int(gap_seconds)} seconds"
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(entity), F.session_window(F.col(ts), gap).alias("session"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("sum_value"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .select(
            entity,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "sum_value",
            "first_ts",
            "last_ts",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    n_state_partitions: int | None = None,
) -> None:
    """Drain all available input and stop (deterministic batch-like run).

    ``n_state_partitions`` pins the stateful query's state partition
    count for this drain (see :func:`state_partitions` for why the
    session's batch shuffle default is the wrong number — 4.6-20x
    measured); ``None`` keeps the session setting.  Ignored by Spark
    for stateless plans.  NOTE the checkpoint freezes the first run's
    value — to change it later, start a fresh checkpoint.
    """
    spark = stream_df.sparkSession

    def _start():
        q = (
            stream_df.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if n_state_partitions is None:
        _start()
    else:
        with state_partitions(spark, n_state_partitions):
            _start()


def dedup_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication, state bounded by the watermark:
    ``dropDuplicatesWithinWatermark`` keeps one row per key among
    duplicates arriving within the watermark horizon and AGES KEYS OUT
    of state once the watermark passes them — the production form of
    exact dedup for unbounded ingestion, where a plain
    ``dropDuplicates`` would grow state forever.

    Contract vs batch: equal to ``df.dropDuplicates(id_cols)`` whenever
    re-sends of a key arrive within ``watermark`` of the original
    (pytest-pinned); re-sends later than the horizon are re-admitted by
    design — that is the bounded-state trade every streaming dedup
    makes, and the horizon is the knob.
    """
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def windowed_counts_stream(
    events: DataFrame,
    window_seconds: int,
    entity: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked TUMBLING-window aggregates per entity — the canonical
    Structured Streaming shape (groupBy window + watermark): counts and
    sums per (entity, aligned time bucket), with state for a window
    retired once the watermark passes its end, so unbounded ingestion
    holds only the open-window frontier in state.

    Windows align to the epoch (Spark ``window()`` semantics), so the
    batch equivalent is exactly ``floor(epoch(ts)/w)*w`` bucketing — the
    gate replays it that way in DuckDB.
    """
    win = F.window(F.col(ts), f"{int(window_seconds)} seconds")
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(entity), win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).alias("sum_value"),
        )
        .select(
            entity,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream × static broadcast enrichment join — the stateless
    streaming shape (dimension lookup per event: user profile, model
    routing table, feature store snapshot).

    The static side is explicitly ``broadcast()`` so every micro-batch
    plans a BroadcastHashJoin: no shuffle, no state store, result rows
    independent of micro-batch slicing (gate-deterministic in append
    mode, unlike stateful aggregates).  For a SLOWLY CHANGING dimension,
    re-read it per trigger via a ``foreachBatch`` re-join or switch to
    a stream-stream join with watermarks; this operator is the static
    form.
    """
    from pyspark.sql import functions as _F

    keys = [on] if isinstance(on, str) else list(on)
    return events.join(_F.broadcast(dim), keys, how)
