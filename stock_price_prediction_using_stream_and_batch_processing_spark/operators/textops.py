"""Document-table text analysis operators (north-star surface):
language ID, quality scoring, token counting, fingerprinting. Thin
DataFrame wrappers over functions/text.py column expressions — all
JVM-side, fully pushdown/pruning-friendly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing, text


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per doc with the full text-quality feature set.

    One-pass shape: the normalize regex runs ONCE per row (stage 1),
    tokens are split from it once (stage 2), and every ratio/score is
    arithmetic over those materialized columns (stage 3). Catalyst's
    CollapseProject keeps the staging because the intermediates are
    non-cheap and multiply referenced — previously quality_score
    re-derived the whole regex tree per term (~5× regex per row)."""
    norm = df.select(
        "doc_id",
        text.normalize(text_col).alias("_norm"),
        text.punct_ratio(text_col).alias("_punct"),
        text.bpe_ish_token_count(text_col).alias("n_subword_tokens"),
        text.char_count(text_col).alias("n_chars_actual"),
    )
    toksed = norm.select(
        "doc_id",
        text.tokens_from_normalized(F.col("_norm")).alias("_toks"),
        F.md5("_norm").alias("fingerprint"),  # == hashing.fingerprint(text)
        "_punct",
        "n_subword_tokens",
        "n_chars_actual",
    )
    sized = toksed.select(
        "doc_id",
        F.size("_toks").alias("_n"),
        text.stopword_ratio_from_tokens(F.col("_toks")).alias("_sw"),
        "_punct",
        "n_subword_tokens",
        "n_chars_actual",
        "fingerprint",
    )
    return sized.select(
        "doc_id",
        F.col("_n").alias("n_tokens"),
        "n_subword_tokens",
        "n_chars_actual",
        F.round("_punct", 6).alias("punct_ratio"),
        F.round("_sw", 6).alias("stopword_ratio"),
        F.round(
            text.quality_score_from(F.col("_n").cast("double"), F.col("_punct"), F.col("_sw")), 6
        ).alias("quality"),
        text.lang_id_from(F.col("_n"), F.col("_sw")).alias("lang_pred"),
        "fingerprint",
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """punct/stopword ratios + composite quality, one regex pass per row
    (the hot-path subset of :func:`text_profile`)."""
    base = df.select(
        F.col(id_col),
        text.tokens(text_col).alias("_toks"),
        text.punct_ratio(text_col).alias("_punct"),
    )
    sized = base.select(
        id_col,
        F.size("_toks").alias("_n"),
        text.stopword_ratio_from_tokens(F.col("_toks")).alias("_sw"),
        "_punct",
    )
    return sized.select(
        id_col,
        F.round("_punct", 6).alias("punct_ratio"),
        F.round("_sw", 6).alias("stopword_ratio"),
        F.round(
            text.quality_score_from(F.col("_n").cast("double"), F.col("_punct"), F.col("_sw")), 6
        ).alias("quality"),
    )


def token_frequencies(df: DataFrame, text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Corpus token frequency table — explode + count (one shuffle with
    map-side combine; at scale this is the canonical word-count plan)."""
    toks = df.select(F.explode(text.tokens(text_col)).alias("token"))
    out = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    return out.filter(F.col("cnt") >= min_count)


def winnowed_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: hash every char ``k``-gram
    of the normalized text, slide a ``window``-position window, keep the
    min hash of each window, emit the DISTINCT selected hashes per doc.
    Guarantees any match of length >= k+window-1 shares a fingerprint —
    the local-similarity detector exact md5 fingerprints can't provide
    (Schleimer et al.'s MOSS algorithm).

    Plan: per-row k-gram array (positions via sequence; the lambda only
    touches a plain column attribute, so no per-element re-evaluation of
    the normalize tree) -> posexplode -> per-doc ordered window min ->
    distinct. One shuffle keyed by doc."""
    from pyspark.sql import Window as W

    norm = text.normalize(text_col)
    d = df.select(F.col(id_col), norm.alias("_norm")).filter(F.length("_norm") >= k)
    grams = d.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("_norm") - k + 1),
                lambda i: F.col("_norm").substr(i, F.lit(k)),
            )
        ).alias("pos", "gram"),
    )
    hashed = grams.select(id_col, "pos", hashing.hex32_to_long(F.md5("gram")).alias("h"))
    w = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    # only full windows select a fingerprint (last window-1 positions are
    # covered by earlier windows)
    n_pos = W.partitionBy(id_col)
    win_min = hashed.withColumn("_n", F.max("pos").over(n_pos)).filter(
        F.col("pos") <= F.col("_n") - window + 1
    ).withColumn("fp", F.min("h").over(w))
    return win_min.select(id_col, "fp").distinct()


# PII patterns shared with the DuckDB oracle — RE2-safe (no lookaround),
# identical semantics under Java regex and DuckDB/RE2.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scrub emails / phone numbers / IPv4s from the text column,
    replacing each match with a typed placeholder ([EMAIL], ...), and
    count the redactions per type. One projection, all JVM-side regex —
    the standard pre-training privacy scrub. (A production pipeline
    swaps in NER-model patterns; the plumbing — ordered regex cascade +
    per-type counts in a single pass — is what this operator is.)"""
    redacted = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name.lower()}"))
        redacted = F.regexp_replace(redacted, pat, f"[{name}]")
    return df.select(F.col(id_col), redacted.alias("text_redacted"), *counts)
