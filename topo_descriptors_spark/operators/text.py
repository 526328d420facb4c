"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting and
document fingerprinting over a ``documents(doc_id, text, ...)`` table.
All pure JVM-side expressions (split/regexp/array lambdas) — no Python
UDFs anywhere.

Cross-engine determinism: every hash in the dedup/fingerprint family is
the *portable hash* — the top 15 hex digits (60 bits) of md5 as int64 —
which DuckDB reproduces exactly (``('0x'||substr(md5(s),1,15))::BIGINT``),
so even hash-based operators can get exact SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# portable 60-bit hash: identical in Spark and DuckDB (see module docstring).
# {col} may be any SQL expression evaluating to a string.
PORTABLE_HASH_SQL = "cast(conv(substr(md5(cast({col} as binary)),1,15),16,10) as bigint)"
# modulus for affine re-hash families; 31 bits so (a*h+b) stays in int64
HASH_PRIME = 2_147_483_647


def portable_hash(col: str) -> Column:
    """Portable hash of a column (or SQL expression string)."""
    return F.expr(PORTABLE_HASH_SQL.format(col=col))


def words_sql(text: str = "text") -> str:
    """SQL for whitespace tokenization with empty tokens dropped — matches
    DuckDB ``list_filter(string_split_regex(text,'\\s+'), w -> w <> '')``."""
    return f"filter(split({text}, '\\\\s+'), w -> w != '')"


def shingles_sql(text: str = "text", n: int = 3) -> str:
    """SQL for word n-gram shingles joined with single spaces.  Docs with
    fewer than n words yield an empty array."""
    w = words_sql(text)
    parts = ", ".join(f"element_at({w}, i + {j + 1})" for j in range(n))
    return (
        f"case when size({w}) >= {n} then "
        f"transform(sequence(0, size({w}) - {n}), i -> concat_ws(' ', {parts})) "
        f"else array() end"
    )


def shingle_hashes_sql(text: str = "text", n: int = 3) -> str:
    """SQL for the array of portable hashes of a doc's shingles."""
    h = PORTABLE_HASH_SQL.format(col="s")
    return f"transform({shingles_sql(text, n)}, s -> {h})"


def words_col(text: str = "text") -> Column:
    return F.expr(words_sql(text))


def token_count(df: DataFrame, text: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(words_col(text)))


# tiny per-language stopword marker lists for the stopword language
# heuristic; fold order fixes deterministic tie-breaks (first wins).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "de", "los", "que", "es"],
}


def _marker_hits(words: Column, markers: list[str]) -> Column:
    lw = F.transform(words, lambda w: F.lower(w))
    return F.size(F.filter(lw, lambda w: w.isin(*markers)))


def lang_id(df: DataFrame, text: str = "text", out: str = "pred_lang") -> DataFrame:
    """Stopword-count language heuristic; deterministic argmax (a later
    language replaces only on strictly greater score, so ties keep the
    earlier language); 'und' (undetermined) when nothing matches."""
    w = words_col(text)
    scored = None
    for lang, markers in LANG_MARKERS.items():
        hit = _marker_hits(w, markers)
        struct = F.struct(hit.alias("score"), F.lit(lang).alias("lang"))
        scored = (
            struct
            if scored is None
            else F.when(struct["score"] > scored["score"], struct).otherwise(scored)
        )
    return df.withColumn(
        out, F.when(scored["score"] > 0, scored["lang"]).otherwise(F.lit("und"))
    )


def quality_score(df: DataFrame, text: str = "text", out: str = "quality") -> DataFrame:
    """Deterministic quality heuristics: token count, mean word length,
    stopword ratio, symbol ratio, and a composite score in [0, 1]
    (Gopher-style pretraining-corpus filter rules)."""
    w = words_col(text)
    n_tok = F.size(w)
    n_chars = F.length(F.col(text))
    mean_wlen = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, _marker_hits(w, LANG_MARKERS["en"]) / n_tok
    ).otherwise(F.lit(0.0))
    alnum_chars = F.length(F.regexp_replace(F.col(text), "[^a-zA-Z0-9 ]", ""))
    symbol_ratio = F.when(n_chars > 0, (n_chars - alnum_chars) / n_chars).otherwise(
        F.lit(0.0)
    )
    score = (
        F.when((n_tok >= 16) & (n_tok <= 4096), 0.25).otherwise(0.0)
        + F.when((mean_wlen >= 3) & (mean_wlen <= 10), 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.25).otherwise(0.0)
        + F.when(symbol_ratio <= 0.1, 0.25).otherwise(0.0)
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_word_len", mean_wlen)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn(out, score)
    )


def fingerprint(
    df: DataFrame, text: str = "text", shingle_n: int = 3, out: str = "fingerprint"
) -> DataFrame:
    """Document fingerprint: min portable-hash over word shingles (a
    1-permutation MinHash — stable under whitespace renormalization);
    falls back to the whole-text hash for docs shorter than one shingle."""
    return df.withColumn(
        out,
        F.coalesce(
            F.array_min(F.expr(shingle_hashes_sql(text, shingle_n))),
            portable_hash(text),
        ),
    )
