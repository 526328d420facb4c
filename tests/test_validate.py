"""Schema validation at operator entry (P7 — the check_dem analog,
reference helpers.py:171-189): wrong-schema inputs fail fast at the API
boundary with a message naming the operator, column and expected type."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from topo_descriptors_spark.functions.validate import (
    SchemaError,
    check_table,
    require_cols,
)
from topo_descriptors_spark.operators import dedup, similarity, text, tiles
from topo_descriptors_spark.operators import window as W


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(10).select(
        F.col("id").alias("entity_id"),
        F.col("id").cast("double").alias("value"),
        F.col("id").alias("ts"),
        F.lit("hello world").alias("text"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )


def test_missing_column_names_operator_and_candidates(df):
    with pytest.raises(SchemaError) as ei:
        W.tpi(df, [3], value="elevation", entity="entity_id", order="ts")
    msg = str(ei.value)
    assert "tpi" in msg and "'elevation'" in msg and "missing" in msg
    assert "value" in msg  # lists present columns


def test_wrong_type_message(df):
    with pytest.raises(SchemaError) as ei:
        W.tpi(df, [3], value="text", entity="entity_id", order="ts")
    msg = str(ei.value)
    assert "'text'" in msg and "string" in msg and "numeric" in msg


def test_time_axis_rejected_for_string_order(df):
    bad = df.withColumn("ts_s", F.col("ts").cast("string"))
    with pytest.raises(SchemaError):
        W.sessionize(bad, gap_seconds=60, entity="entity_id", order="ts_s")
    # but a plain orderable op accepts a string order column
    W.tpi(bad, [3], value="value", entity="entity_id", order="ts_s")


def test_text_and_dedup_entry_checks(df):
    with pytest.raises(SchemaError):
        text.token_count(df.drop("text"))
    with pytest.raises(SchemaError):
        dedup.exact_dedup_groups(df, text="value")  # numeric, not string


def test_similarity_entry_checks(df):
    with pytest.raises(SchemaError):
        similarity.cosine_topk(df, id_col="entity_id", vec="value")  # not array
    with pytest.raises(SchemaError):
        similarity.ann_topk_blocked(df.drop("embedding"), id_col="entity_id")


def test_tiles_entry_check(df):
    with pytest.raises(SchemaError) as ei:
        tiles.tpi_2d(df, (8, 8), size=3, tile_size=4)  # no y/x columns
    assert "apply_grid_kernel" in str(ei.value)


def test_check_table_exact_contract(df):
    expected = StructType(
        [
            StructField("entity_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    check_table(df, expected, name="events")  # subset match ok

    wrong = StructType(
        [
            StructField("entity_id", StringType()),
            StructField("altitude", DoubleType()),
        ]
    )
    with pytest.raises(SchemaError) as ei:
        check_table(df, wrong, name="events")
    msg = str(ei.value)
    assert msg.startswith("events:")
    assert "'altitude'" in msg and "'entity_id'" in msg

    with pytest.raises(SchemaError) as ei2:
        check_table(df.select("entity_id", "value", "text"), expected,
                    name="events", strict=True)
    assert "unexpected columns" in str(ei2.value)


def test_require_cols_is_driver_side_only(df):
    """No Spark job may run during validation."""
    guarded = df.select("entity_id", "value", "ts")

    def boom(*a, **k):
        raise AssertionError("validation launched a Spark action")

    guarded.first = boom
    guarded.head = boom
    guarded.collect = boom
    require_cols(guarded, "op", entity_id="atomic", value="numeric",
                 ts="time_axis")


def test_reserved_temp_columns_raise_not_clobber(df, spark):
    """VERDICT r4: an input already carrying an operator's internal
    temp-column name must raise cleanly, never be silently clobbered.
    One probe per operator named in the verdict, plus the factored
    helper itself."""
    from topo_descriptors_spark.functions.validate import reserve_cols
    from topo_descriptors_spark.operators import features as FE

    reserve_cols(df, "op", "_nope")  # absent -> no-op
    with pytest.raises(SchemaError, match=r"op: .*reserved.*_ts"):
        reserve_cols(df.withColumn("_ts", F.lit(1)), "op", "_ts")

    with_bkt = df.withColumn("_bkt", F.lit(0))
    with pytest.raises(SchemaError, match="resample_ohlc"):
        FE.resample_ohlc(with_bkt, 60, value="value",
                         entity="entity_id", order="ts")

    docs = df.select(F.col("entity_id").cast("string").alias("doc_id"), "text")
    with pytest.raises(SchemaError, match="gopher_rules"):
        text.gopher_rules(docs.withColumn("_gw", F.lit(0)))
    with pytest.raises(SchemaError, match="token_bigram_topk"):
        text.token_bigram_topk(docs.withColumn("_toks", F.lit(0)))
    with pytest.raises(SchemaError, match="bm25_score"):
        text.bm25_score(docs.withColumn("_dl", F.lit(0)), ["hello"])
    with pytest.raises(SchemaError, match="script_profile"):
        text.script_profile(docs.withColumn("_n_script", F.lit(0)))
    # script_profile also reserves its OUTPUT names: a pre-existing
    # latin_frac would otherwise duplicate in the final projection
    with pytest.raises(SchemaError, match="script_profile"):
        text.script_profile(docs.withColumn("latin_frac", F.lit(0.0)))


def test_reserved_temp_columns_full_sweep(df, spark):
    """Uniform coverage: every passthrough operator that stages temp
    columns on its input rejects a colliding input column."""
    from topo_descriptors_spark.operators import features as FE

    docs = df.select(F.col("entity_id").cast("string").alias("doc_id"), "text")
    cases = [
        ("count_encode", lambda d: FE.count_encode(d, category="text"), "_ck"),
        ("feature_hash",
         lambda d: FE.feature_hash(d, id_col="doc_id", cols=["text"]), "_fh"),
        ("hash_vectorize_text",
         lambda d: FE.hash_vectorize_text(d, id_col="doc_id"), "_tk"),
        ("impute", lambda d: FE.impute(d.withColumn("v", F.lit(1.0)),
                                       value="v"), "_fill"),
        ("lang_id", text.lang_id, "_lw"),
        ("quality_score", text.quality_score, "_qw"),
        ("repetition_stats", text.repetition_stats, "_rw"),
        ("redact_pii", text.redact_pii, "_t1"),
        ("dedup_lines", lambda d: text.dedup_lines(d), "_larr"),
    ]
    for name, call, col in cases:
        with pytest.raises(SchemaError, match=name):
            call(docs.withColumn(col, F.lit(0)))
