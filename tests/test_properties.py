"""Property-based tests (hypothesis): operator compositions must equal
their naive reference implementations on arbitrary small inputs — the
cases hand-written fixtures miss (ties, empty groups, single rows,
boundary timestamps).

Strategy sizes are kept small (Spark job per example); deadline=None
because JVM scheduling jitter breaks hypothesis' default timing.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup, joins, skew, windows

BASE_TS = dt.datetime(2024, 1, 1)

# (key, ts_offset_seconds, value) rows; ts offsets may collide across keys
ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=5000),
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=25,
)

PROP = settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture]
)


def _df(spark, rows, dedup_ts=True):
    # unique (key, ts) per key keeps window order deterministic
    seen, out = set(), []
    for k, off, v in rows:
        if dedup_ts and (k, off) in seen:
            continue
        seen.add((k, off))
        out.append((k, BASE_TS + dt.timedelta(seconds=off), float(v)))
    return out, spark.createDataFrame(out or [(0, BASE_TS, 0.0)][:0], "k long, ts timestamp, v double")


@PROP
@given(rows=ROWS)
def test_trailing_mean_equals_python(spark, rows):
    data, df = _df(spark, rows)
    got = {
        (r.k, r.ts): r.m
        for r in windows.trailing_mean(df, "k", "ts", "v", 3, out="m").collect()
    }
    by_key: dict = {}
    for k, ts, v in sorted(data):
        by_key.setdefault(k, []).append((ts, v))
    for k, series in by_key.items():
        for i, (ts, _) in enumerate(series):
            window = [v for _, v in series[max(0, i - 2) : i + 1]]
            assert got[(k, ts)] == pytest.approx(sum(window) / len(window), rel=1e-9)


@PROP
@given(rows=ROWS)
def test_sessionize_equals_python(spark, rows):
    data, df = _df(spark, rows)
    got = {(r.k, r.ts): r.session_id for r in windows.sessionize(df, "k", "ts", gap_minutes=10.0).collect()}
    by_key: dict = {}
    for k, ts, v in sorted(data):
        by_key.setdefault(k, []).append(ts)
    for k, series in by_key.items():
        sid = 0
        prev = None
        for ts in series:
            if prev is None or (ts - prev).total_seconds() > 600:
                sid += 1
            assert got[(k, ts)] == sid
            prev = ts


@PROP
@given(rows=ROWS)
def test_interval_join_equals_theta_join(spark, rows):
    data, df = _df(spark, rows)
    iv = df.select(
        F.col("k").alias("iv_k"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 20 MINUTES")).alias("end"),
    )
    got = {
        (r.k, r.ts, r.iv_k, r.start)
        for r in joins.interval_join(df, iv, "ts", "start", "end", bucket_seconds=1200).collect()
    }
    want = set()
    for k, ts, _ in data:
        for ik, its, _ in data:
            if its <= ts < its + dt.timedelta(minutes=20):
                want.add((k, ts, ik, its))
    assert got == want


@PROP
@given(rows=ROWS, n_salts=st.integers(min_value=1, max_value=5))
def test_salted_agg_equals_direct_property(spark, rows, n_salts):
    data, df = _df(spark, rows, dedup_ts=False)
    df = df.withColumn("uid", F.monotonically_increasing_id())
    got = {
        r.k: (r.sum_value, r.n_rows)
        for r in skew.salted_sum_count(df, ["k"], "v", "uid", n_salts=n_salts).collect()
    }
    want: dict = {}
    for k, _, v in data:
        s, c = want.get(k, (0.0, 0))
        want[k] = (s + v, c + 1)
    assert set(got) == set(want)
    for k, (s, c) in want.items():
        assert got[k][1] == c and got[k][0] == pytest.approx(s, rel=1e-9, abs=1e-9)


@PROP
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda p: p[0] != p[1]),
        min_size=0,
        max_size=15,
    )
)
def test_dedup_clusters_equals_union_find(spark, pairs):
    norm = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    if not norm:
        return
    df = spark.createDataFrame(norm, "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(df).collect()}
    # union-find reference
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in norm:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


TEXT_ROWS = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=30),
    min_size=0,
    max_size=8,
)


@PROP
@given(docs=TEXT_ROWS, chunk=st.integers(min_value=2, max_value=6), overlap=st.integers(min_value=0, max_value=4))
def test_chunk_documents_equals_python(spark, docs, chunk, overlap):
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import textops

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows or [(0, "")][:0], "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_chunk_tokens)
        for r in textops.chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        for ci, s in enumerate(range(0, len(toks), stride)):
            piece = toks[s : s + chunk]
            want[(i, ci)] = (" ".join(piece), len(piece))
    assert got == want


@PROP
@given(docs=TEXT_ROWS)
def test_repetition_features_equals_python(spark, docs):
    from collections import Counter

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import textops

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows or [(0, "")][:0], "doc_id long, text string")
    got = {
        r.doc_id: (r.dup_token_frac, r.top_token_frac, r.dup_bigram_frac)
        for r in textops.repetition_features(df).collect()
    }
    for i, toks in enumerate(docs):
        n = len(toks)
        c = Counter(toks)
        dup = round(1.0 - len(c) / n, 6) if n else 0.0
        top = round(max(c.values()) / n, 6) if n else 0.0
        if n >= 2:
            bigrams = [f"{toks[j]} {toks[j+1]}" for j in range(n - 1)]
            dbg = round(1.0 - len(set(bigrams)) / (n - 1), 6)
        else:
            dbg = 0.0
        assert got[i] == (dup, top, dbg), f"doc {i}: {got[i]} != {(dup, top, dbg)}"
