"""Stateful streaming operator: state accumulates across micro-batches
and the final per-entity state equals the batch aggregate."""

import os
import tempfile
import time

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from topo_descriptors_spark.streaming.state import running_entity_state


def test_running_state_across_batches(spark):
    rng = np.random.RandomState(7)
    t0 = pd.Timestamp("2024-01-01")

    def batch(offset_h, n=40):
        return pd.DataFrame(
            {
                "user_id": rng.randint(0, 6, n).astype(np.int64),
                "ts": [
                    t0 + pd.Timedelta(hours=offset_h, seconds=int(i) * 37)
                    for i in range(n)
                ],
                "value": rng.rand(n) * 10,
            }
        )

    b1, b2 = batch(0), batch(12)
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        os.makedirs(src)
        spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/b1")
        time.sleep(1.1)
        spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/b2")
        schema = spark.read.parquet(f"{src}/b1").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        out = running_entity_state(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("state_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.sql("select * from state_test").toPandas()

    # take each entity's LAST emitted update (the one with max n_events)
    final = got.sort_values("n_events").groupby("entity").tail(1)
    both = pd.concat([b1, b2])
    expect = (
        both.sort_values("ts")
        .groupby("user_id")
        .agg(
            last_ts=("ts", "max"),
            n_events=("value", "size"),
            sum_value=("value", "sum"),
        )
        .reset_index()
    )
    merged = final.merge(expect, left_on="entity", right_on="user_id",
                         suffixes=("", "_exp"))
    assert len(merged) == len(expect)
    assert (merged["n_events"] == merged["n_events_exp"]).all()
    assert np.allclose(merged["sum_value"], merged["sum_value_exp"])
    assert merged["last_ts"].equals(merged["last_ts_exp"])
    # state genuinely accumulated across micro-batches: at least one
    # entity was emitted twice (once per batch) with growing n_events
    multi = got.groupby("entity").size()
    assert (multi >= 2).any()


def test_decayed_stream_equals_batch_operator(spark):
    """decayed_entity_state must reproduce the batch decayed_features
    row for row (bounded trailing-k state IS the batch window), with
    state carrying across micro-batches (time-ordered files)."""
    rng = np.random.RandomState(11)
    t0 = pd.Timestamp("2024-01-01")

    def batch(offset_h, start_id, n=40):
        return pd.DataFrame(
            {
                "event_id": np.arange(start_id, start_id + n, dtype=np.int64),
                "user_id": rng.randint(0, 4, n).astype(np.int64),
                "ts": [
                    t0 + pd.Timedelta(hours=offset_h, seconds=int(i) * 1800)
                    for i in range(n)
                ],
                "value": np.where(
                    rng.rand(n) < 0.1, np.nan, rng.rand(n) * 10
                ),
            }
        )

    # batch 2 strictly later than batch 1 so cross-batch arrival order
    # equals time order (the documented incremental-state contract)
    b1, b2 = batch(0, 0), batch(40, 100)
    from topo_descriptors_spark.operators.window import decayed_features
    from topo_descriptors_spark.streaming.state import decayed_entity_state

    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        os.makedirs(src)
        spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/b1")
        time.sleep(1.1)
        spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/b2")
        schema = spark.read.parquet(f"{src}/b1").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        out = decayed_entity_state(
            stream, half_life_seconds=3600.0, lookback_rows=8
        )
        q = (
            out.writeStream.format("memory")
            .queryName("decay_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = (
            spark.sql("select * from decay_test").toPandas()
            .sort_values("id").reset_index(drop=True)
        )

    both = pd.concat([b1, b2])
    exp = (
        decayed_features(
            spark.createDataFrame(both), half_life_seconds=3600.0,
            entity="user_id", order="ts", value="value",
            lookback_rows=8, tiebreak="event_id",
        )
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == len(exp) == 80
    assert (got["id"].to_numpy() == exp["event_id"].to_numpy()).all()
    assert np.allclose(got["decayed_sum"], exp["decayed_sum"], atol=1e-9)
    assert np.allclose(got["decayed_count"], exp["decayed_count"], atol=1e-9)
    # multiple micro-batches really happened (state carried over)
    assert got["id"].max() >= 100
