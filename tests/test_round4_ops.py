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
