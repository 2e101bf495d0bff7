"""Model-based stateful property test of the snapshot store: a random
sequence of table verbs (append / equality-delete / merge / compact /
Z-ORDER compact / expire / rename) is applied in parallel to the real
store and to a trivial in-memory model, and the CURRENT-snapshot read
must equal the model's multiset after EVERY step. This is the
cross-verb interaction fuzz the hand-written matrices can't enumerate:
deletes landing over duplicate keys, merges over deleted rows,
compaction materializing delete files mid-sequence, retention expiring
the history a rename rode in on.

Strategy sizes are small (each verb is a Spark job); deadline=None for
JVM jitter, max_examples kept low — the value is the verb-sequence
space, not the row-value space.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap

# verbs: ("append", rows) | ("delete", keys) | ("merge", {k: v}) |
#        ("compact",) | ("zorder",) | ("expire",) | ("rename",)
_KEYS = st.integers(min_value=0, max_value=9)
_VALS = st.integers(min_value=-50, max_value=50)

VERB = st.one_of(
    st.tuples(st.just("append"), st.lists(st.tuples(_KEYS, _VALS), min_size=1, max_size=5)),
    st.tuples(st.just("delete"), st.lists(_KEYS, min_size=1, max_size=3, unique=True)),
    st.tuples(st.just("merge"), st.dictionaries(_KEYS, _VALS, min_size=1, max_size=3)),
    st.tuples(st.just("compact")),
    st.tuples(st.just("zorder")),
    st.tuples(st.just("expire")),
    st.tuples(st.just("rename")),
)

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _read_multiset(spark, d, vcol):
    df = snap.read_snapshot(spark, d)
    assert df.columns == ["k", vcol], df.columns
    return Counter((r[0], r[1]) for r in df.collect())


@PROP
@given(
    seed=st.lists(st.tuples(_KEYS, _VALS), min_size=1, max_size=5),
    verbs=st.lists(VERB, min_size=1, max_size=6),
)
def test_store_matches_model_after_every_verb(spark, tmp_path_factory, seed, verbs):
    d = str(tmp_path_factory.mktemp("store_model") / "t")

    def df_of(rows, vcol):
        return spark.createDataFrame(
            [(int(k), float(v)) for k, v in rows], f"k long, {vcol} double"
        )

    vcol = "v"
    model = Counter((int(k), float(v)) for k, v in seed)
    snap.snapshot_append(spark, d, df_of(seed, vcol), stats_cols=["k"])
    assert _read_multiset(spark, d, vcol) == model

    # the shadow lifecycle the model must follow: a successful rename
    # leaves its OLD name as a live mapping source; renaming onto a
    # live source refuses until a FULL rewrite (compact/zorder)
    # retires the mapping (the r15 resurrection fence)
    mapping_source: str | None = None

    def do_rename(old, new):
        nonlocal mapping_source
        if mapping_source == new:
            with pytest.raises(ValueError, match="shadow"):
                snap.snapshot_rename_column(d, old, new)
            snap.snapshot_compact(spark, d, target_files=2)
            mapping_source = None
        snap.snapshot_rename_column(d, old, new)
        mapping_source = old

    for verb in verbs:
        op = verb[0]
        if op == "append":
            rows = verb[1]
            snap.snapshot_append(spark, d, df_of(rows, vcol), stats_cols=["k"])
            model.update((int(k), float(v)) for k, v in rows)
        elif op == "delete":
            keys = verb[1]
            snap.snapshot_delete(
                spark, d, spark.createDataFrame([(int(k),) for k in keys], "k long"), "k"
            )
            model = Counter({r: c for r, c in model.items() if r[0] not in set(keys)})
        elif op == "merge":
            ups = verb[1]
            snap.snapshot_merge(spark, d, df_of(sorted(ups.items()), vcol), key="k")
            model = Counter({r: c for r, c in model.items() if r[0] not in ups})
            model.update((int(k), float(v)) for k, v in ups.items())
        elif op == "compact":
            snap.snapshot_compact(spark, d, target_files=2)
            mapping_source = None  # full rewrite retires the mapping
        elif op == "zorder":
            snap.snapshot_compact(spark, d, target_files=2, cluster_by=["k", vcol])
            mapping_source = None
        elif op == "expire":
            snap.expire_snapshots(d, keep_last=1)
        elif op == "rename":
            new = "price" if vcol == "v" else "v"
            do_rename(vcol, new)
            vcol = new
        assert _read_multiset(spark, d, vcol) == model, f"diverged after {op}"
