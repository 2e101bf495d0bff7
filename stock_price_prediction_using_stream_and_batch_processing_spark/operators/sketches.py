"""Mergeable-sketch rollups: the distinct-count analogue of the
multi-resolution OHLC hypertable (operators/windows.multi_res_ohlc).

Exact COUNT(DISTINCT) cannot roll up — distincts don't add — so a
hierarchy of time resolutions normally means re-scanning raw data per
level. HyperLogLog sketches merge by register-max (exact algebra: the
union's registers are the pointwise max of its inputs'), so the raw
table is scanned ONCE into fine-grained sketch partials and every
coarser level derives from unions of those partials — at 100 TB the
day/week/month levels read kilobyte sketches, not the corpus. This is
Spark 4's built-in Apache DataSketches integration
(``hll_sketch_agg`` / ``hll_union_agg``).

Estimator-path caveat (measured, round 8): a UNION-result sketch and a
DIRECTLY-BUILT sketch of the same set give identical estimates in the
sparse/coupon regime (pinned strictly equal in tests/test_approx.py at
sf0.01) but can diverge ≤0.3% once dense mode kicks in (~1.3k
distincts at lgK=12, measured at sf0.1) — different estimator paths
over equivalent register state, not merge loss. Replay idempotency
(re-merging already-ingested rows changes nothing) stays EXACT at any
scale — pure register-max. The registered query faces carry these as
invariant value oracles (plans/timeseries.hll_rollup_daily_users,
plans/streamplans.stream_sketch_maintenance); error bounds vs exact
counts are pinned in tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hll_fine_sketches(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    fine: str = "hour",
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch per fine-grained time bucket — the materialized
    base of the rollup hierarchy. (bucket_start, sketch) rows: this is
    what a maintenance job persists; kilobytes per bucket."""
    bucket = F.date_trunc(fine, F.col(ts_col))
    return df.groupBy(bucket.alias("bucket_start")).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )


def hll_rollup(
    fine_sketches: DataFrame,
    coarse: str = "day",
) -> DataFrame:
    """Coarse-level distinct estimates from fine-level sketch partials
    ONLY — no raw-data rescan. Groups fine buckets into the coarse
    bucket and unions their sketches; the estimate matches one computed
    directly over raw data at the coarse level (exactly in the sparse
    regime, within the estimator-path caveat above in dense mode)."""
    coarse_bucket = F.date_trunc(coarse, F.col("bucket_start"))
    return (
        fine_sketches.groupBy(coarse_bucket.alias("bucket_start"))
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("sketch"))).cast("long").alias("approx_distinct")
        )
    )


def refresh_hll_fine(
    spark,
    sketch_path: str,
    new_raw: DataFrame,
    ts_col: str,
    value_col: str,
    fine: str = "hour",
    lgk: int = 12,
    partition_col: str | None = "part_date",
) -> int:
    """Incremental maintenance of the MATERIALIZED fine-sketch table —
    the distinct-count twin of windows.refresh_ohlc_fine: only the new
    batch's raw rows are sketched; their partials union with the stored
    sketches of exactly the affected buckets (semi-join pruned) and
    MERGE back replacing those rows only.

    ``partition_col`` (default on, mirroring refresh_ohlc_fine): the
    store is laid out partitioned by the bucket's UTC date and the
    merge-back rewrites ONLY the dates the batch touched (dynamic
    partition overwrite) — without it every refresh reads and rewrites
    the WHOLE table, so per-batch cost grows with history instead of
    staying O(batch + affected dates). ``None`` keeps a flat table —
    short-lived scratch stores only. Readers should ignore the
    partition column (``hll_rollup`` groups on bucket_start and does).

    Replay tolerance comes FREE here, with no epoch marker: HLL union
    is idempotent at the element level (register max), so a retried
    foreachBatch epoch re-merging the same rows cannot DOUBLE-COUNT —
    strictly stronger than the bar table, whose n_ticks counts would
    double (hence its marker guard). Precision caveat (measured, round
    8): the ESTIMATE read from a re-merged sketch is bit-stable in the
    sparse regime but jitters ±1-2 counts per union round-trip in
    dense mode (DataSketches serialization/estimator path,
    non-accumulating across further replays) — bounded noise inside
    the sketch's own error envelope, not drift. The remaining
    non-transactionality (crash between slice read and overwrite) has
    the same parquet-only bound documented at
    streaming/pipeline.maintain_bars_batch. Returns sketch rows
    written. Layout/guard/prune scaffolding is shared with the bar
    table via :func:`operators.maintenance.refresh_partials`; only the
    sketch-union merge function lives here."""
    from .maintenance import refresh_partials

    batch = hll_fine_sketches(new_raw, ts_col, value_col, fine, lgk)
    return refresh_partials(
        spark,
        sketch_path,
        batch,
        ["bucket_start"],
        lambda existing, b: existing.unionByName(b)
        .groupBy("bucket_start")
        .agg(F.hll_union_agg("sketch").alias("sketch")),
        partition_col,
        table_desc="sketch table",
    )


def _cms_bucket(row_col, tok_col, width: int):
    """The CMS hash: h_row(tok) = int(md5(row ‖ ':' ‖ tok)[:8 hex]) mod
    width. ONE definition shared by build (``cms_table`` /
    ``cms_fine_tables``) and probe (``cms_estimates``) — estimate
    correctness and every SQL oracle depend on all sites computing the
    identical expression, so there is exactly one."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col(row_col), F.col(tok_col))), 1, 8), 16, 10
        ).cast("long"),
        F.lit(width),
    )


def cms_table(
    tokens: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch of a token stream as a (row, bucket, n) table —
    depth×width counters, built with ONE aggregate over the exploded
    tokens (each occurrence contributes to ``depth`` counters via an
    explode of its row indexes; map-side combine ships at most
    depth×width partial rows per partition regardless of corpus size).

    Unlike the HLL family, every counter is DETERMINISTIC given the
    md5-derived hash functions — h_i(t) = int(md5(i ‖ ':' ‖ t)[:8hex])
    mod width — so the sketch, and any estimate read from it, has an
    exact engine-portable SQL twin: the first sketch in the engine with
    a full value-level oracle rather than an invariant-only check.

    Scale: the sketch is O(depth×width) — kilobytes — independent of
    corpus size; counters are mergeable by addition, so partials roll
    up across partitions, days, or snapshots like the OHLC/HLL stores
    (a maintenance job appends partial tables and sums on read)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    t = tokens.select(F.col(token_col).alias("_tok"), rows)
    bucket = _cms_bucket("row", "_tok", width)
    return (
        t.select("row", bucket.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _probe_buckets(
    probes: DataFrame, token_col: str, depth: int, width: int, row_col: str = "row"
) -> DataFrame:
    """Expand probe tokens to their (token, row, bucket) counter
    addresses — the probe half of every estimate read. ONE definition
    (like ``_cms_bucket``) shared by the flat and per-time-bucket
    estimators, so a change to probe expansion cannot diverge between
    read paths. ``row_col`` matches the build side's row-index column
    name ("row" for ``cms_table``, "hrow" for ``cms_fine_tables``)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias(row_col)
    p = probes.select(F.col(token_col), rows)
    return p.select(
        F.col(token_col), F.col(row_col), _cms_bucket(row_col, token_col, width).alias("bucket")
    )


def cms_estimates(
    cms: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each probe token against the sketch: min over the
    ``depth`` counters the token hashes into (the count-min guarantee:
    estimate ≥ true count always; ≤ true + εN with prob 1−δ for
    ε=e/width, δ=e^−depth — pinned in tests/test_approx.py). The
    sketch side is tiny, so the probe join broadcasts it."""
    p = _probe_buckets(probes, token_col, depth, width, row_col="row")
    joined = p.join(F.broadcast(cms), ["row", "bucket"], "left").na.fill({"n": 0})
    return joined.groupBy(token_col).agg(F.min("n").alias("cms_count"))


def cms_fine_tables(
    df: DataFrame,
    ts_col: str,
    token_col: str,
    fine: str = "hour",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """One count-min counter table PER fine time bucket —
    (bucket_start, hrow, bucket, n) rows, the CMS analogue of
    ``hll_fine_sketches``: what a maintenance job persists, and what
    coarser resolutions derive from by SUMMING counters (addition is
    the CMS merge). One aggregate, map-side combined; at most
    depth×width non-zero counters per bucket regardless of traffic."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("hrow")
    t = df.select(
        F.date_trunc(fine, F.col(ts_col)).alias("bucket_start"),
        F.col(token_col).alias("_tok"),
        rows,
    )
    return (
        t.select("bucket_start", "hrow", _cms_bucket("hrow", "_tok", width).alias("bucket"))
        .groupBy("bucket_start", "hrow", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_rollup_tables(fine: DataFrame, coarse: str = "day") -> DataFrame:
    """Coarse-resolution CMS counter tables from fine-level partials
    ONLY — no raw-data rescan (the count-min analogue of
    ``hll_rollup``): counters merge by ADDITION, which commutes and
    associates, so summing each (hrow, bucket) across the fine buckets
    inside a coarse bucket yields a table IDENTICAL to one built
    directly over raw data at the coarse resolution. At 100 TB the
    day/week levels read kilobyte counter tables, not the corpus; and
    unlike HLL the identity is value-exact, so it carries a full SQL
    oracle (plans/timeseries.cms_rollup_daily_tokens)."""
    coarse_bucket = F.date_trunc(coarse, F.col("bucket_start"))
    return (
        fine.groupBy(coarse_bucket.alias("bucket_start"), "hrow", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def cms_bucket_estimates(
    cms_tables: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-(bucket_start, token) point estimates against a PER-BUCKET
    CMS table (``cms_fine_tables`` / ``cms_rollup_tables`` output):
    min over the ``depth`` counters each probe token hashes into,
    within every time bucket. A probe token absent from a bucket's
    counters reads 0 — the left join + fill keeps the count-min
    guarantee (estimate ≥ true count) per bucket. The probe grid is
    |buckets| × |probes| × depth rows — both factors are tiny by
    construction (probes are a curated token list; buckets are time
    resolutions), so the crossJoin broadcasts and never touches the
    corpus."""
    buckets = cms_tables.select("bucket_start").distinct()
    p = _probe_buckets(probes, token_col, depth, width, row_col="hrow")
    grid = buckets.crossJoin(F.broadcast(p))
    joined = grid.join(cms_tables, ["bucket_start", "hrow", "bucket"], "left").na.fill({"n": 0})
    return joined.groupBy("bucket_start", token_col).agg(F.min("n").alias("cms_count"))


def refresh_cms_fine(
    spark,
    cms_path: str,
    new_raw: DataFrame,
    ts_col: str,
    token_col: str,
    fine: str = "hour",
    depth: int = 4,
    width: int = 1024,
    partition_col: str | None = "part_date",
) -> int:
    """Incremental maintenance of the MATERIALIZED per-bucket CMS table:
    only the new batch's rows are counted; their partial counters ADD
    into the stored counters of exactly the affected
    (bucket_start, hrow, bucket) keys, and only touched date partitions
    rewrite (operators/maintenance.refresh_partials scaffolding, shared
    with the bar and HLL stores).

    Addition commutes and associates, so the final table is IDENTICAL
    to a one-shot aggregation for ANY split of the input — including
    late data. UNLIKE the HLL store, a replayed foreachBatch epoch
    would DOUBLE-COUNT (addition is not idempotent): stream drivers
    must wrap calls in an epoch-marker guard, exactly like the bar
    table (streaming/pipeline.maintain_bars_batch pattern)."""
    from .maintenance import refresh_partials

    batch = cms_fine_tables(new_raw, ts_col, token_col, fine, depth, width)
    return refresh_partials(
        spark,
        cms_path,
        batch,
        ["bucket_start", "hrow", "bucket"],
        lambda existing, b: existing.unionByName(b)
        .groupBy("bucket_start", "hrow", "bucket")
        .agg(F.sum("n").alias("n")),
        partition_col,
        table_desc="cms table",
    )


# --- KMV (k-minimum-values / bottom-k) distinct sketches ------------
#
# The set-operation sketch HLL lacks: because a KMV sketch IS a sample
# (the k smallest md5 hash values of the distinct items), sketches
# SUPPORT INTERSECTION — merge two sketches, re-take the k smallest
# (that is the exact KMV of the union), and the fraction of those that
# appear in both inputs estimates the Jaccard similarity; overlap =
# jaccard x union-estimate. And unlike HLL's opaque registers, every
# step is deterministic integer/float algebra over md5, so a DuckDB
# oracle replays it BIT-FOR-BIT — the only approximate-distinct family
# in the engine with a full SQL differential rather than an invariant
# bound. (Classic theta-sketch construction; estimate (k-1)/t with t =
# kth smallest hash normalized to [0,1).)

KMV_HASH_SPACE = float(1 << 32)  # md5 first 8 hex chars -> [0, 2^32)


def kmv_hash(col) -> "F.Column":
    """Engine-portable uniform hash: first 8 md5 hex chars as a long.
    Identical in Spark (conv(.., 16, 10)) and DuckDB
    (('0x' || substr(md5(..), 1, 8))::BIGINT)."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast("long")


def kmv_sketches(
    df: DataFrame,
    seg_col: str,
    value_col: str,
    k: int = 64,
    n_shards: int = 64,
) -> DataFrame:
    """One KMV sketch per segment: (seg, kmin array<long>) with kmin =
    the k smallest distinct hash values (ALL of them, sorted, when the
    segment has fewer than k — the sketch is then exact).

    Scale shape — min-k is computed in MERGEABLE form, never by sorting
    a whole segment in one task: distinct (seg, hash) pairs shard by
    hash % n_shards, each (seg, shard) takes its local bottom-k with a
    rank window (spill-safe, sorts 1/n_shards of the segment), and the
    segment level merges n_shards bounded arrays exactly the way two
    KMV sketches merge — concatenate, sort, cut at k. Three keyed
    shuffles of hash-sized rows; no unbounded per-group state."""
    h = kmv_hash(value_col).alias("h")
    d = df.select(F.col(seg_col).alias("seg"), h).distinct()
    w = Window.partitionBy("seg", F.col("h") % n_shards).orderBy("h")
    local = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return (
        local.groupBy("seg", (F.col("h") % n_shards).alias("_shard"))
        .agg(F.sort_array(F.collect_list("h")).alias("part"))
        .groupBy("seg")
        .agg(
            F.slice(F.array_sort(F.flatten(F.collect_list("part"))), 1, k).alias("kmin")
        )
    )


def kmv_estimate(kmin_col: str, k: int) -> "F.Column":
    """Distinct estimate off a kmin array: exact count when the sketch
    holds the whole segment (< k values), else the classic (k-1)/t
    with t = kth smallest hash / 2^32 — i.e. (k-1) * 2^32 / kth, one
    double division (bit-identical across engines)."""
    return F.when(
        F.size(kmin_col) < k, F.size(kmin_col).cast("double")
    ).otherwise(
        F.lit(float(k - 1) * KMV_HASH_SPACE)
        / F.element_at(F.col(kmin_col), k).cast("double")
    )


def kmv_merge(a_col: str, b_col: str, k: int) -> "F.Column":
    """Sketch of the UNION of two segments from their sketches alone:
    concatenate, dedup, sort, cut at k — by the bottom-k property this
    equals the KMV built directly over the combined data (pinned in
    tests/test_approx.py)."""
    u = F.array_sort(F.array_union(F.col(a_col), F.col(b_col)))
    return F.slice(u, 1, F.least(F.lit(k), F.size(u)))


def kmv_overlap(a_col: str, b_col: str, k: int) -> dict[str, "F.Column"]:
    """Intersection-size estimate between two segments from their
    sketches: jaccard_est = |K ∩ A ∩ B| / |K| over the union sketch K,
    overlap_est = jaccard_est x union_estimate. Returns the named
    column expressions (union sketch, matches, jaccard, overlap) so
    query faces can project what they need."""
    union_sk = kmv_merge(a_col, b_col, k)
    kk = F.size(union_sk)
    matches = F.size(
        F.array_intersect(F.array_intersect(union_sk, F.col(a_col)), F.col(b_col))
    )
    jac = matches / kk  # single int/int division: bit-identical x-engine
    # union estimate from the merged sketch: exact when the union fits
    union_full = F.array_sort(F.array_union(F.col(a_col), F.col(b_col)))
    union_est = F.when(F.size(union_full) < k, F.size(union_full).cast("double")).otherwise(
        F.lit(float(k - 1) * KMV_HASH_SPACE) / F.element_at(union_sk, k).cast("double")
    )
    return {
        "matches": matches,
        "jaccard_est": jac,
        "union_est": union_est,
        "overlap_est": jac * union_est,
    }


def kmv_fine_sketches(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    k: int = 128,
    fine: str = "day",
    n_shards: int = 64,
) -> DataFrame:
    """One KMV sketch per time bucket: (bucket_start, kmin) — the
    bottom-k twin of :func:`hll_fine_sketches`, feeding the same
    mergeable-partial store scaffold (shard-merged construction, see
    :func:`kmv_sketches`)."""
    bucketed = df.select(
        F.date_trunc(fine, F.col(ts_col)).alias("bucket_start"),
        F.col(value_col).alias("_v"),
    )
    return kmv_sketches(bucketed, "bucket_start", "_v", k=k, n_shards=n_shards).select(
        F.col("seg").alias("bucket_start"), "kmin"
    )


def refresh_kmv_fine(
    spark,
    sketch_path: str,
    new_raw: DataFrame,
    ts_col: str,
    value_col: str,
    k: int = 128,
    fine: str = "day",
    partition_col: str | None = "part_date",
) -> int:
    """Incremental maintenance of the MATERIALIZED KMV (bottom-k)
    sketch table — the 6th mergeable-partial store on the shared
    :func:`operators.maintenance.refresh_partials` scaffold (bars, HLL,
    CMS, histograms, linear-count sets, now KMV). Only the new batch's
    raw rows are sketched; their partials merge with the stored
    sketches of exactly the affected buckets (semi-join pruned) via the
    n-way bottom-k merge (concatenate, dedup, sort, cut at k — the
    same property tests/test_approx.py pins pairwise for
    :func:`kmv_merge`).

    Replay tolerance is FREE and EXACT, with no epoch marker: the merge
    deduplicates hash values, so re-merging already-ingested rows (a
    retried foreachBatch epoch, an at-least-once redelivery) leaves the
    stored ``kmin`` arrays BIT-IDENTICAL — strictly stronger than the
    HLL store, whose re-merged estimates jitter ±1-2 counts in dense
    mode. The stream-maintained table therefore equals the one-shot
    batch build exactly, for ANY micro-batch split — which is what lets
    the streaming face carry a full bit-level SQL differential.
    Returns sketch rows written."""
    from .maintenance import refresh_partials

    batch = kmv_fine_sketches(new_raw, ts_col, value_col, k=k, fine=fine)
    return refresh_partials(
        spark,
        sketch_path,
        batch,
        ["bucket_start"],
        lambda existing, b: existing.unionByName(b)
        .groupBy("bucket_start")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmin")))),
                1,
                k,
            ).alias("kmin")
        ),
        partition_col,
        table_desc="kmv sketch table",
    )
