"""Document-table text analysis operators (north-star surface):
language ID, quality scoring, token counting, fingerprinting. Thin
DataFrame wrappers over functions/text.py column expressions — all
JVM-side, fully pushdown/pruning-friendly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing, text


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per doc with the full text-quality feature set."""
    return df.select(
        "doc_id",
        text.token_count(text_col).alias("n_tokens"),
        text.bpe_ish_token_count(text_col).alias("n_subword_tokens"),
        text.char_count(text_col).alias("n_chars_actual"),
        F.round(text.punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(text.stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(text.quality_score(text_col), 6).alias("quality"),
        text.lang_id(text_col).alias("lang_pred"),
        hashing.fingerprint(text_col).alias("fingerprint"),
    )


def token_frequencies(df: DataFrame, text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Corpus token frequency table — explode + count (one shuffle with
    map-side combine; at scale this is the canonical word-count plan)."""
    toks = df.select(F.explode(text.tokens(text_col)).alias("token"))
    out = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    return out.filter(F.col("cnt") >= min_count)
