"""Similarity search over embedding columns (array<float>).

Two tiers, per the north-star spec:
- ``brute_force_topk``: exact cosine top-k — broadcast the (small)
  query set against the full corpus; per-row JVM arithmetic via
  higher-order functions, TakeOrdered per query. The baseline/oracle.
- ``lsh_topk``: random-hyperplane LSH buckets; only vectors sharing a
  bucket (in any of ``n_tables`` tables) are compared. At 100 TB the
  bucket join replaces the corpus broadcast-scan with a shuffle whose
  size is the candidate set. Probing uses multi-table OR-construction.
- ``embedding_near_dup_pairs``: near-duplicate detection (cosine >=
  threshold) via the same LSH bucketing, self-join flavor.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).tolist()


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. ``queries`` must be
    small (it is broadcast); the corpus side streams — no corpus
    shuffle. Ties broken by corpus id for determinism."""
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    joined = corpus.join(F.broadcast(q), F.col(corpus_id) != F.col(query_id))
    scored = joined.select(
        query_id,
        corpus_id,
        vectors.cosine(vec_col, "_qv").alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Attach ``n_tables`` LSH bucket keys (sign-projection signatures).
    Deterministic: planes come from a seeded RNG folded in as literals."""
    out = df
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed + 1000 * t)
        out = out.withColumn(f"lsh_{t}", vectors.sign_projection_bits(vec_col, planes))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only bucket-colliding (query, corpus)
    pairs across ``n_tables`` tables. Recall grows with tables; cost is
    the candidate join instead of the full scan."""
    cb = with_lsh_buckets(corpus, vec_col, dim, n_planes, n_tables, seed)
    qb = with_lsh_buckets(queries.select(F.col(query_id), F.col(vec_col).alias("_qv")), "_qv", dim, n_planes, n_tables, seed)
    c_long = cb.select(
        corpus_id, vec_col, F.explode(F.array(*[F.concat_ws(":", F.lit(str(t)), f"lsh_{t}") for t in range(n_tables)])).alias("bkt")
    )
    q_long = qb.select(
        query_id, "_qv", F.explode(F.array(*[F.concat_ws(":", F.lit(str(t)), f"lsh_{t}") for t in range(n_tables)])).alias("bkt")
    )
    cand = (
        c_long.join(F.broadcast(q_long), "bkt")
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(query_id, corpus_id, vec_col, "_qv")
        .distinct()
    )
    scored = cand.select(query_id, corpus_id, vectors.cosine(vec_col, "_qv").alias("cosine_sim"))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH self-join: pairs sharing
    any bucket are verified with exact cosine >= threshold."""
    b = with_lsh_buckets(df.select(id_col, vec_col), vec_col, dim, n_planes, n_tables, seed)
    long = b.select(id_col, vec_col, F.explode(F.array(*[F.concat_ws(":", F.lit(str(t)), f"lsh_{t}") for t in range(n_tables)])).alias("bkt"))
    a, c = long.alias("a"), long.alias("b")
    cand = (
        a.join(c, F.col("a.bkt") == F.col("b.bkt"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("_va"),
            F.col(f"b.{vec_col}").alias("_vb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("cosine_sim", vectors.cosine("_va", "_vb"))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
