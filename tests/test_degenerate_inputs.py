"""Degenerate-input smoke: every family tolerates the rows a 100-TB
corpus WILL contain.

The r8 edge probes found two stage-killer families on exactly these
inputs (ANSI divide-by-zero on lone-sample frames; np.stack on
empty-array embeddings).  This file pins the *rest* of the surface that
already passed, so a refactor can't quietly regress it: empty string /
single-token / NULL docs through the text ops, 1-row and 0-row frames
through splits/packing/encodings, all-NaN values through impute.
Specific crash reproductions live next to their fixes
(test_window_property.py, test_similarity.py).
"""

import pandas as pd
import pytest

from topo_descriptors_spark.operators import (
    dedup as D,
    features as FE,
    pipeline as P,
    text as T,
)


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["", "one", "two words", None]}
    )
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def rows(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "source": ["web"],
            "n_tok": [0],
            "ts": [pd.Timestamp("2024-01-01")],
            "value": [float("nan")],
            "entity_id": ["e"],
            "domain": ["d"],
        }
    )
    pdf["value"] = pdf["value"].astype("float64")
    return spark.createDataFrame(pdf)


def test_text_ops_tolerate_empty_single_and_null_docs(docs):
    per_doc = [
        T.token_count, T.token_count_regex, T.lang_id, T.quality_score,
        T.gopher_rules, T.repetition_stats, T.fingerprint, T.redact_pii,
        T.script_profile, T.dedup_lines, T.unigram_logprob,
        T.bigram_logprob,
    ]
    for fn in per_doc:
        assert fn(docs).count() == 4, fn.__name__
    assert T.dataset_card(docs).count() == 1
    # corpus-level ops: just must not raise on the degenerate corpus
    T.vocab_topk(docs).count()
    T.tfidf_topk(docs).count()
    T.token_bigram_topk(docs).count()


def test_dedup_ops_tolerate_degenerate_docs(docs):
    assert D.exact_dedup(docs).count() == 4
    assert D.simhash(docs).count() == 4
    assert D.ngram_jaccard_pairs(docs).count() == 0  # nothing shingles
    assert D.fuzzy_pairs_ed1(docs, "text").count() == 0


def test_pipeline_and_features_tolerate_one_and_zero_rows(rows):
    empty = rows.where("doc_id < 0")
    weights = {"train": 0.8, "test": 0.2}
    for frame, n in ((rows, 1), (empty, 0)):
        assert P.hash_split(frame, weights).count() == n
        assert P.stratified_split(frame, {"web": weights}).count() == n
        assert P.pack_sequences_cumsum(frame, 512).count() == n
        assert P.pack_sequences_greedy(frame, 512).count() == n
        assert P.temporal_split(frame, "entity_id", "ts").count() == n
        assert FE.count_encode(frame, "domain").count() == n
        # smoothing=0 + singleton category exercises the den==0 branch
        # of the leave-one-out encoder (lazy CaseWhen guard, no ANSI
        # DIVIDE_BY_ZERO)
        assert FE.target_encode(
            frame, "domain", "value", smoothing=0.0
        ).count() == n
        assert FE.group_entropy(frame, "entity_id", "domain").count() == n
        assert FE.impute(frame, "value").count() == n
        assert FE.robust_scale(frame, "value").count() == n


def test_rolling_quantiles_all_null_window_is_null(spark):
    pdf = pd.DataFrame(
        {"entity_id": ["e"] * 3, "ts": [1, 2, 3],
         "value": [None, None, 5.0]}
    )
    pdf["value"] = pdf["value"].astype("float64")
    out = FE.rolling_quantiles(
        spark.createDataFrame(pdf), k=2, qs=[0.5], value="value",
        entity="entity_id", order="ts",
    ).orderBy("ts").collect()
    assert [r.rq_p50 for r in out] == [None, None, 5.0]
