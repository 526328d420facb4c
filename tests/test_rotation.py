"""Driver-window rotation properties (VERDICT r6 #2).

The driver records official correctness rows for only the first
``_WINDOW`` entries of ``queries()``; ``__spark_entry__`` computes that
window from a fixed canonical order + per-round stride.  These tests
pin the freshness guarantee the rotation exists for: every contract
query appears in the official window of any 3 consecutive rounds, for
every rotation phase and any legal pinned/touched head.

No SparkSession needed — the rotation is pure list arithmetic.
"""

import sys

import pytest

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import __spark_entry__ as entry


def test_contract_complete_and_unique():
    qs = entry.queries()
    contract = entry._contract()
    assert len(qs) == len(contract)  # rotation reorders, never drops
    assert set(qs) == set(contract)
    # every query has an oracle or is a documented rows-only row
    assert set(entry.oracle_sql()) <= set(qs)


def test_head_rows_lead_the_window():
    keys = list(entry.queries())
    head = [k for k in entry._PINNED + entry._TOUCHED
            if k in set(entry._contract())]
    assert keys[: len(head)] == head
    assert len(head) <= entry._WINDOW - entry._STRIDE


def test_three_round_coverage_every_phase():
    """Any 3 consecutive windows cover the whole contract — the stride
    is sized so 3 * _STRIDE >= len(contract) survives the modular
    wrap, for every possible starting round."""
    contract = list(entry._contract())
    head = entry._PINNED + entry._TOUCHED
    for base in range(entry._BASE_ROUND, entry._BASE_ROUND + len(contract)):
        covered = set()
        for r in (base, base + 1, base + 2):
            covered |= set(
                entry._window_order(r, head, contract)[: entry._WINDOW])
        assert covered == set(contract), f"gap at base round {base}"


def test_three_round_coverage_with_max_head():
    """Coverage holds even when pinned+touched fill the whole window
    slack (the worst legal head)."""
    contract = list(entry._contract())
    slack = entry._WINDOW - entry._STRIDE
    head = tuple(contract[i * 13 % len(contract)] for i in range(slack))
    for base in (entry._BASE_ROUND, entry._BASE_ROUND + 1,
                 entry._BASE_ROUND + 5):
        covered = set()
        for r in (base, base + 1, base + 2):
            covered |= set(
                entry._window_order(r, head, contract)[: entry._WINDOW])
        assert covered == set(contract)


def test_oversized_head_raises():
    contract = list(entry._contract())
    too_big = tuple(contract[: entry._WINDOW - entry._STRIDE + 1])
    with pytest.raises(ValueError, match="window slack"):
        entry._window_order(entry.ROUND, too_big, contract)


def test_unknown_head_key_raises():
    """A typo'd/renamed _PINNED or _TOUCHED entry must fail loudly, not
    silently drop the intended re-verification (ADVICE r7)."""
    contract = list(entry._contract())
    with pytest.raises(KeyError, match="not in the contract"):
        entry._window_order(
            entry.ROUND, ("w_tpi_multiscale", "no_such_query"), contract)


def test_head_keys_exist_in_contract():
    """The live _PINNED/_TOUCHED must all be real contract keys — the
    companion guard to test_unknown_head_key_raises (ADVICE r7)."""
    assert set(entry._PINNED + entry._TOUCHED) <= set(entry._contract())


def test_round7_window_matches_curation_note():
    """ROUND=7 (with r7's recorded head) must reproduce the r6 verdict's
    ROUND-7 CURATION NOTE: all 18 r4-official rows inside the window."""
    r4_rows = {
        "a_corr_matrix", "d_bloom_prune", "a_funnel", "p_stratified_split",
        "a_robust_scale", "a_entropy", "t_bigram_logprob",
        "p_weighted_sample", "d_domain_cap", "d_fuzzy_ed1", "a_impute",
        "j_asof_forward", "t_bm25", "t_gopher", "t_token_bigrams",
        "d_token_prefix_dup", "a_heavy_hitters", "w_cum_distinct",
    }
    r7_head = entry._PINNED + (
        "w_sessionize_stream", "w_dedup_stream", "w_decayed_stream",
        "w_window_counts_stream", "w_enrich_stream",
    )
    window = set(entry._window_order(
        7, r7_head, list(entry._contract()))[: entry._WINDOW])
    assert r4_rows <= window


def test_selfcheck_window_prefix_check():
    """VERDICT r7 #5: selfcheck's FULL-artifact emission must assert its
    50-row prefix equals the driver window — both directions proven."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "selfcheck", os.path.join(os.path.dirname(__file__), "..",
                                  "scripts", "selfcheck.py"))
    selfcheck = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(selfcheck)
    good = list(entry.queries())
    selfcheck.check_window_prefix(good)  # must not raise
    drifted = good[1:] + good[:1]
    with pytest.raises(AssertionError, match="drifted"):
        selfcheck.check_window_prefix(drifted)


def test_round8_window_pulls_r5_rows():
    """ROUND=8 phase 1 must pull the 16 rows that were r5-official at
    the end of r7 into the official window (VERDICT r7 #2)."""
    r5_rows = {
        "a_rank_ops", "d_decontaminate", "f_json_extract", "p_hash_split",
        "p_pack_cumsum", "p_pack_greedy", "p_resample", "p_sample_mix",
        "s_rand_proj", "t_fingerprint", "t_lang_id", "t_pii_redact",
        "t_quality", "t_token_count", "t_token_regex", "w_session_stats",
    }
    assert entry.ROUND == 8
    window = set(list(entry.queries())[: entry._WINDOW])
    assert r5_rows <= window
