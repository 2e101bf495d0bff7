"""Unit tests for the round-4 operator additions: edit-distance-verified
near-dup pairs, per-group z-score outliers, weighted deterministic
sampling (A-ES), and SCD-2 interval history (gaps-and-islands)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup, quality, sampling, sequences


# --- edit_distance_pairs ----------------------------------------------------


def test_edit_distance_pairs_verifies_candidates(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("quick", "quack", 1)),  # 1 char edit
            (3, "completely different text about spark catalyst " * 4),
        ],
        ["doc_id", "text"],
    )
    cands = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], ["id_a", "id_b"])
    out = dedup.edit_distance_pairs(docs, "text", "doc_id", max_dist=10, candidates=cands)
    rows = {(r["id_a"], r["id_b"]): r["edit_dist"] for r in out.collect()}
    assert rows == {(1, 2): 1}


def test_edit_distance_pairs_length_gate_excludes(spark):
    docs = spark.createDataFrame(
        [(1, "short text"), (2, "short text plus a very long tail " * 10)],
        ["doc_id", "text"],
    )
    cands = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    out = dedup.edit_distance_pairs(docs, "text", "doc_id", max_dist=5, candidates=cands)
    assert out.count() == 0


def test_edit_distance_pairs_lsh_end_to_end(spark):
    # LSH-generated candidates: near-identical docs pair up, the
    # unrelated doc does not survive verification even if banded.
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [(1, a), (2, a.replace("zeta", "zetas", 1)), (3, "unrelated corpus entirely " * 6)],
        ["doc_id", "text"],
    )
    out = dedup.edit_distance_pairs(docs, "text", "doc_id", max_dist=10)
    rows = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert rows == [(1, 2)]


# --- zscore_outliers --------------------------------------------------------


def test_zscore_outliers_flags_planted(spark):
    rows = [("a", float(v)) for v in [10, 11, 9, 10, 11, 9, 10, 11, 9, 100]]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = quality.zscore_outliers(df, "k", "v", z_thresh=2.0)
    got = out.collect()
    assert len(got) == 1 and got[0]["v"] == 100.0
    # z matches a direct computation
    vals = [r[1] for r in rows]
    m = sum(vals) / len(vals)
    sd = math.sqrt(sum((x - m) ** 2 for x in vals) / (len(vals) - 1))
    assert got[0]["zscore"] == pytest.approx((100 - m) / sd)


def test_zscore_outliers_degenerate_groups_silent(spark):
    df = spark.createDataFrame(
        [("const", 5.0), ("const", 5.0), ("const", 5.0), ("single", 42.0)],
        ["k", "v"],
    )
    assert quality.zscore_outliers(df, "k", "v").count() == 0


# --- weighted_hash_sample ---------------------------------------------------


def test_weighted_sample_deterministic_and_capped(spark):
    df = spark.createDataFrame(
        [(i, "s" if i % 2 else "t", float(1 + i % 7)) for i in range(400)],
        ["id", "stratum", "w"],
    )
    a = sampling.weighted_hash_sample(df, "id", "w", m=20, strata_col="stratum")
    b = sampling.weighted_hash_sample(df.repartition(7), "id", "w", m=20, strata_col="stratum")
    ra = sorted((r["stratum"], r["id"], r["sample_rank"]) for r in a.collect())
    rb = sorted((r["stratum"], r["id"], r["sample_rank"]) for r in b.collect())
    assert ra == rb  # partitioning-independent
    per = {}
    for s, _, rk in ra:
        per.setdefault(s, []).append(rk)
    assert set(per) == {"s", "t"}
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, 21))


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0), (5, 1.0)],
        ["id", "w"],
    )
    out = sampling.weighted_hash_sample(df, "id", "w", m=10)
    assert sorted(r["id"] for r in out.collect()) == [4, 5]


def test_weighted_sample_weight_bias(spark):
    # A-ES property check: one row with overwhelming weight is all but
    # guaranteed a top rank; with 1000 draws of weight 1 vs one row of
    # weight 1e6, the heavy row must be sampled into the top 10.
    rows = [(i, 1.0) for i in range(1000)] + [(9999, 1e6)]
    df = spark.createDataFrame(rows, ["id", "w"])
    out = sampling.weighted_hash_sample(df, "id", "w", m=10)
    assert 9999 in {r["id"] for r in out.collect()}


def test_weighted_sample_salt_redraws(spark):
    df = spark.createDataFrame([(i, 1.0) for i in range(500)], ["id", "w"])
    a = {r["id"] for r in sampling.weighted_hash_sample(df, "id", "w", m=50, salt="a").collect()}
    b = {r["id"] for r in sampling.weighted_hash_sample(df, "id", "w", m=50, salt="b").collect()}
    assert a != b  # independent draw
    assert len(a) == len(b) == 50


# --- interval_history -------------------------------------------------------


def _hist_rows(spark, obs):
    df = spark.createDataFrame(obs, ["k", "seq", "ts", "status"])
    out = sequences.interval_history(df, "k", "ts", "status", tiebreak="seq")
    return sorted(
        ((r["k"], r["status"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out.collect()),
        key=lambda t: (t[0], t[1] or "", t[2]),
    )


def test_interval_history_collapses_runs(spark):
    rows = _hist_rows(
        spark,
        [
            ("c1", 1, 10, "O"),
            ("c1", 2, 20, "O"),  # same run
            ("c1", 3, 30, "F"),
            ("c1", 4, 40, "O"),  # status returns -> NEW run, not merged
            ("c2", 5, 15, "P"),
        ],
    )
    assert rows == [
        ("c1", "F", 30, 40, False),
        ("c1", "O", 10, 30, False),
        ("c1", "O", 40, None, True),
        ("c2", "P", 15, None, True),
    ]


def test_interval_history_null_runs_and_guard(spark):
    rows = _hist_rows(
        spark,
        [("k", 1, 1, None), ("k", 2, 2, None), ("k", 3, 3, "A")],
    )
    assert rows == [("k", None, 1, 3, False), ("k", "A", 3, None, True)]
    df = spark.createDataFrame([(1, 2, 3, 4)], ["k", "ts", "a", "_run"])
    with pytest.raises(ValueError, match="_run"):
        sequences.interval_history(df, "k", "ts", "a")


def test_interval_history_single_shuffle_partitioning(spark):
    # both windows and the groupBy key on k: exactly two Exchanges total
    # (observations, runs) and no rangepartitioning anywhere.
    df = spark.createDataFrame(
        [("k%d" % (i % 5), i, i * 10, "s%d" % (i % 3)) for i in range(100)],
        ["k", "seq", "ts", "status"],
    )
    out = sequences.interval_history(df, "k", "ts", "status", tiebreak="seq")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


# --- gapfill_locf -----------------------------------------------------------


def test_gapfill_locf_fills_and_flags(spark):
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows as W

    # key "a": observations in buckets 0 and 3 (60s buckets); buckets
    # 1-2 must be synthesized, carrying bucket 0's mean.
    df = spark.createDataFrame(
        [("a", 10.0, 2.0), ("a", 20.0, 4.0), ("a", 190.0, 9.0), ("b", 70.0, 1.0)],
        ["k", "sec", "v"],
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "v")
    out = W.gapfill_locf(df, "k", "ts", "v", bucket_seconds=60)
    rows = {(r["k"], r["bucket"]): (r["value_filled"], r["gap_filled"]) for r in out.collect()}
    assert rows == {
        ("a", 0): (3.0, False),
        ("a", 1): (3.0, True),
        ("a", 2): (3.0, True),
        ("a", 3): (9.0, False),
        ("b", 1): (1.0, False),
    }


# --- rolling_corr -----------------------------------------------------------


def test_rolling_corr_matches_statistics(spark):
    import statistics

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows as W

    xs = [1.0, 3.0, 2.0, 7.0, 5.0, 4.0]
    ys = [2.0, 5.0, 4.0, 9.0, 9.0, 7.0]
    df = spark.createDataFrame(
        [("k", i, xs[i], ys[i]) for i in range(6)], ["k", "t", "x", "y"]
    )
    out = W.rolling_corr(df, "k", "t", "x", "y", n=3)
    got = {r["t"]: r["rolling_corr"] for r in out.collect()}
    assert got[0] is None  # single-row frame
    for t in range(2, 6):
        exp = statistics.correlation(xs[t - 2 : t + 1], ys[t - 2 : t + 1])
        assert got[t] == pytest.approx(exp, abs=1e-12), t


def test_rolling_corr_degenerate_null_not_error(spark):
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import windows as W

    # constant x: zero variance in every frame -> NULL everywhere, and
    # under ANSI mode the job must not raise DIVIDE_BY_ZERO.
    df = spark.createDataFrame([("k", i, 5.0, float(i)) for i in range(4)], ["k", "t", "x", "y"])
    out = W.rolling_corr(df, "k", "t", "x", "y", n=3).collect()
    assert all(r["rolling_corr"] is None for r in out)


# --- bigram_surprisal -------------------------------------------------------


def test_bigram_surprisal_hand_computed(spark):
    import math

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import textops as T

    # corpus: doc1 "a b a b", doc2 "a b"  (token stream N=6)
    # bigrams: d1: (a,b),(b,a),(a,b); d2: (a,b)  => c2(a,b)=3? no: per
    # doc: d1 has (a,b),(b,a),(a,b); d2 has (a,b) -> c2(a,b)=3, c2(b,a)=1
    # ctx: c(a.)=3, c(b.)=1 ; uni: c(a)=3, c(b)=3, N=6
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b")], ["doc_id", "text"])
    out = {r["doc_id"]: r["bigram_surprisal_nats"] for r in T.bigram_surprisal(df).collect()}
    lam = 0.8
    p_ab = lam * 3 / 3 + (1 - lam) * 3 / 6
    p_ba = lam * 1 / 1 + (1 - lam) * 3 / 6
    d1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    d2 = -math.log(p_ab)
    assert out[1] == pytest.approx(round(d1, 6), abs=2e-6)
    assert out[2] == pytest.approx(round(d2, 6), abs=2e-6)


def test_bigram_surprisal_short_docs_absent(spark):
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import textops as T

    df = spark.createDataFrame([(1, "solo"), (2, "two tokens here")], ["doc_id", "text"])
    out = T.bigram_surprisal(df).collect()
    assert {r["doc_id"] for r in out} == {2}  # <2 tokens: no bigram rows


# --- snapshot_diff ----------------------------------------------------------


def test_snapshot_diff_classifies(spark):
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "CHANGED", 3.0), (4, "d", 4.0)], ["k", "s", "v"]
    )
    out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged -> absent


def test_snapshot_diff_null_vs_empty_and_drift(spark):
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "")], "k long, s string")
    assert [r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()] == ["changed"]
    drifted = spark.createDataFrame([(1, "", 0.0)], ["k", "s", "extra"])
    with pytest.raises(ValueError, match="extra"):
        snapshot_diff(old, drifted, ["k"])


def test_bm25_batch_retrieval_self_top_and_df_cut(spark):
    """On a corpus with distinctive rare terms: (1) every query ranks
    itself #1, (2) the stop-posting cut (max_df_ratio) drops the
    ubiquitous token so a common-token-only query returns nothing."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.textops import bm25_batch_retrieval

    rows = [
        (1, "apple banana common common shared"),
        (2, "cherry date common common shared"),
        (3, "elder fig common common shared"),
        (4, "grape husk common common shared"),
        (5, "iris jade common common shared"),
        (6, "common common common shared shared"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    queries = corpus.where("doc_id in (1, 3)").select(
        F.col("doc_id").alias("qid"), "text"
    )
    got = bm25_batch_retrieval(corpus, queries, k=2, max_df_ratio=0.5)
    out = {(r.qid, r.rank): r.doc_id for r in got.collect()}
    # rare terms survive the cut and are unique -> each query matches
    # only itself ('common'/'shared' appear in ALL 6 docs, df=1.0 > 0.5)
    assert out == {(1, 1): 1, (3, 1): 3}
    # a query with ONLY ubiquitous terms returns nothing under the cut
    q6 = corpus.where("doc_id = 6").select(F.col("doc_id").alias("qid"), "text")
    assert bm25_batch_retrieval(corpus, q6, k=2, max_df_ratio=0.5).count() == 0
    # ...and matches everything without it (k bounds the result)
    assert bm25_batch_retrieval(corpus, q6, k=2, max_df_ratio=1.0).count() == 2
