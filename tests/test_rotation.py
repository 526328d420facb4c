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


def test_round7_window_matches_curation_note():
    """ROUND=7 must reproduce the r6 verdict's ROUND-7 CURATION NOTE:
    all 18 r4-official rows inside the official window."""
    r4_rows = {
        "a_corr_matrix", "d_bloom_prune", "a_funnel", "p_stratified_split",
        "a_robust_scale", "a_entropy", "t_bigram_logprob",
        "p_weighted_sample", "d_domain_cap", "d_fuzzy_ed1", "a_impute",
        "j_asof_forward", "t_bm25", "t_gopher", "t_token_bigrams",
        "d_token_prefix_dup", "a_heavy_hitters", "w_cum_distinct",
    }
    window = set(list(entry.queries())[: entry._WINDOW])
    assert r4_rows <= window
