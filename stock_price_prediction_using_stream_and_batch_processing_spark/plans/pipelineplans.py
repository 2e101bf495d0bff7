"""The composed end-to-end LLM training-data pipeline as ONE registered
query — the nightly job a training-data user actually runs, proving the
individually-tested stages COMPOSE (column contracts, determinism
across stages, attrition accounting):

    documents
      → exact dedup         (min-id keeper per normalized fingerprint)
      → near-dup removal    (MinHash-LSH → exact-Jaccard ≥ 0.8 → CC)
      → quality filter      (composite score ≥ 0.72, ≥ 5 tokens)
      → decontamination     (drop train docs sharing any word 8-gram
                             with the hash-held-out eval split)
      → mixture resample    (deterministic per-source thinning to the
                             target domain mix)
      → context packing     (2048-token bins, 8 shards)

Every stage is the bounded-at-scale variant already proven alone
(operators/dedup.py, operators/sampling.py, functions/text.py): digests
travel the shuffles instead of text, the eval side broadcasts, the
mixture thresholds broadcast, packing is per-shard windows — the whole
chain has no global sort and no driver materialization, so it is the
same plan you would submit over 100 TB.

The oracle replays the ENTIRE chain in DuckDB SQL (shared CTE pipeline,
recursive CTE for the components stage), so the differential checks the
composition end to end — not just the stages.

Reference scope note: the reference pipeline (batch_processor.py,
stream_consumer.py) has no corpus-curation surface; this face is part
of the north-star LLM-data-pipeline extension set (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions import text as tx
from ..operators import dedup, sampling
from ..sources.tables import load_table
from .core import register
from .sampleplans import _bucket_sql
from .textplans import _NORM, _STOPWORDS_SQL

_QUALITY_MIN = 0.72
_MIN_TOKENS = 5
_EVAL_PCT = 5          # doc_id hash buckets 0..4 of 100 → eval split
_MIX_TARGETS = {
    "src0": 2.0, "src1": 2.0, "src2": 1.0, "src3": 1.0,
    "src4": 1.0, "src5": 1.0, "src6": 0.5, "src7": 0.5,
}
_PACK_CAPACITY = 2048
_PACK_SHARDS = 8


def _shingles(n: int) -> str:
    """Distinct word n-gram shingles over the materialized ``toks``
    column (lockstep with functions/text.word_shingles)."""
    return (
        f"list_distinct(list_transform(range(1, greatest(len(toks) - {n}, 0) + 2), "
        f"i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' ')))"
    )


_MIX_VALUES = ", ".join(
    f"('{s}', CAST({t} AS DOUBLE))" for s, t in _MIX_TARGETS.items()
)

# The shared CTE chain both oracles replay. Stage numbering matches the
# attrition rows.
_PIPE_CTES = f"""
WITH RECURSIVE
base AS (
  SELECT doc_id, text, source, {_NORM} AS nm FROM documents
),
fp AS (SELECT doc_id, text, source, nm, md5(nm) AS f FROM base),
k1 AS (SELECT f, MIN(doc_id) AS doc_id FROM fp GROUP BY f),
s1 AS (
  SELECT fp.doc_id, fp.text, fp.source, fp.nm FROM fp JOIN k1 USING (f, doc_id)
),
s1t AS (
  SELECT doc_id, text, source, nm,
         CASE WHEN nm = '' THEN [] ELSE string_split(nm, ' ') END AS toks
  FROM s1
),
-- stage 2: MinHash-LSH candidates -> exact Jaccard >= 0.8 -> connected
-- components -> keep min-id representative (near_dup_filter_docs
-- oracle, re-rooted on the exact-dedup survivors)
sh AS (
  SELECT doc_id, unnest({_shingles(3)}) AS sh FROM s1t WHERE len(toks) > 0
),
d AS (SELECT doc_id, md5('0:' || sh) AS d0, md5('1:' || sh) AS d1 FROM sh),
sig AS (
  SELECT doc_id, s.seed,
         MIN(substr(CASE WHEN s.seed < 4 THEN d0 ELSE d1 END,
                    CAST((s.seed % 4) * 8 + 1 AS INTEGER), 8)) AS mh
  FROM d CROSS JOIN (SELECT unnest(range(8)) AS seed) s
  GROUP BY doc_id, s.seed
),
bands AS (
  SELECT doc_id, CAST(seed // 2 AS INTEGER) AS band,
         md5(CAST(seed // 2 AS VARCHAR) || '|' || string_agg(mh, '|' ORDER BY seed)) AS band_key
  FROM sig GROUP BY doc_id, seed // 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
shd AS MATERIALIZED (SELECT DISTINCT doc_id, md5(sh) AS s FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN shd a ON a.doc_id = c.id_a
  JOIN shd b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY c.id_a, c.id_b
),
ver AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
),
edges AS (SELECT id_a AS st, id_b AS t FROM ver UNION SELECT id_b, id_a FROM ver),
reach(node, lab) AS (
  SELECT st, st FROM edges
  UNION
  SELECT e.st, r.lab FROM edges e JOIN reach r ON e.t = r.node
),
comp AS (SELECT node, MIN(lab) AS lab FROM reach GROUP BY node),
s2 AS (
  SELECT * FROM s1t
  WHERE doc_id NOT IN (SELECT node FROM comp WHERE lab < node)
),
-- stage 3: composite quality filter (raw doubles: identical arithmetic
-- in both engines, so the >= comparison can never straddle a rounding)
s3 AS (
  SELECT doc_id, text, source, toks FROM (
    SELECT *,
      CASE WHEN length(text) > 0
           THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
           ELSE 0.0 END AS punct_r,
      CASE WHEN len(toks) > 0
           THEN CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE) / len(toks)
           ELSE 0.0 END AS sw_r
    FROM s2
  )
  WHERE len(toks) >= {_MIN_TOKENS}
    AND least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0) * 0.4
        + greatest(0.0, 1.0 - punct_r * 4) * 0.3
        + least(sw_r * 5, 1.0) * 0.3 >= {_QUALITY_MIN}
),
-- stage 4: decontaminate the hash-split train side against the eval side
sh8 AS (
  SELECT doc_id, unnest({_shingles(8)}) AS s FROM s3 WHERE len(toks) > 0
),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, md5(s) AS h FROM sh8 WHERE {_bucket_sql('doc_id', 100)} >= {_EVAL_PCT}) t
  JOIN (SELECT md5(s) AS h FROM sh8 WHERE {_bucket_sql('doc_id', 100)} < {_EVAL_PCT}) e USING (h)
),
s4 AS (
  SELECT * FROM s3
  WHERE {_bucket_sql('doc_id', 100)} >= {_EVAL_PCT}
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
-- stage 5: deterministic mixture resample to the target domain weights
mixc AS (SELECT source, COUNT(*) AS n FROM s4 GROUP BY source),
mixt(source, t) AS (VALUES {_MIX_VALUES}),
mixr AS (SELECT mixc.source, mixt.t / mixc.n AS ratio FROM mixc JOIN mixt USING (source)),
mixm AS (SELECT MAX(ratio) AS mx FROM mixr),
mixthr AS (
  SELECT source, CAST(FLOOR(1000000.0 * ratio / mx) AS BIGINT) AS thr
  FROM mixr CROSS JOIN mixm
),
s5 AS (
  SELECT s4.doc_id, s4.source, CAST(len(s4.toks) AS BIGINT) AS n_tokens
  FROM s4 JOIN mixthr USING (source)
  WHERE {_bucket_sql('doc_id', 1000000)} < thr
),
-- stage 6: context-window packing (per-shard running token sums)
s6 AS (
  SELECT doc_id, source, n_tokens,
         {_bucket_sql('doc_id', _PACK_SHARDS)} AS shard,
         CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / {_PACK_CAPACITY}.0) AS BIGINT) AS bin_in_shard
  FROM s5
  WINDOW w AS (PARTITION BY {_bucket_sql('doc_id', _PACK_SHARDS)} ORDER BY doc_id)
)
"""


def _stages(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build every stage DataFrame once; callers pick what they return.
    Lazy plans — nothing executes here."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")

    # stage 1: exact dedup by normalized-content fingerprint, min-id keeper.
    # The survivor set fans out into EVERY later stage (the LSH stages
    # reference it 3x, the split twice more) — without lineage
    # truncation the composed plan re-reads the raw corpus 18 times
    # (measured at sf0.01); the lazy localCheckpoint materializes the
    # survivors once and caps the whole chain at ~2 corpus scans.
    fp = d.withColumn("_f", hashing.fingerprint("text"))
    k1 = fp.groupBy("_f").agg(F.min("doc_id").alias("doc_id"))
    s1 = fp.join(k1, ["_f", "doc_id"]).drop("_f").localCheckpoint(eager=False)

    # stage 2: LSH near-dup removal (exact collapse already done — the
    # pre-stage would be an idempotent extra shuffle)
    s2 = dedup.near_dup_filter(
        s1, "text", "doc_id", num_hashes=8, bands=4, dedup_exact_first=False
    )

    # stage 3: quality filter on raw (un-rounded) score. Checkpointed
    # for the same reason as s1: train/eval/contamination all branch
    # from this frame.
    s3 = s2.where(
        (tx.token_count("text") >= _MIN_TOKENS)
        & (tx.quality_score("text") >= F.lit(_QUALITY_MIN))
    ).localCheckpoint(eager=False)

    # stage 4: decontaminate train split against the held-out eval split
    b = sampling.hash_bucket("doc_id", 100)
    train, eval_df = s3.filter(b >= _EVAL_PCT), s3.filter(b < _EVAL_PCT)
    cont = (
        dedup.ngram_contamination(train, eval_df, "text", "doc_id", shingle_n=8)
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
    )
    s4 = train.join(cont, "doc_id", "left_anti")

    # stage 5: mixture resample to target domain weights
    s5 = sampling.mixture_resample(s4, "source", "doc_id", _MIX_TARGETS).select(
        "doc_id", "source", tx.token_count("text").cast("long").alias("n_tokens")
    )

    # stage 6: pack into context-window bins
    s6 = sampling.pack_greedy(
        s5, "doc_id", "n_tokens", capacity=_PACK_CAPACITY, n_shards=_PACK_SHARDS
    ).select("doc_id", "source", "n_tokens", "shard", "bin_in_shard")

    return {"raw": d, "s1": s1, "s2": s2, "s3": s3, "s4": s4, "s5": s5, "s6": s6}


@register(
    "pipeline_docs_end_to_end",
    oracle=_PIPE_CTES + "SELECT doc_id, source, n_tokens, shard, bin_in_shard FROM s6",
    tags=("pipeline", "dedup", "quality", "decontamination", "mixture", "packing"),
)
def pipeline_docs_end_to_end(spark, sf_dir):
    """The full curation chain as one lazy plan: each surviving doc with
    its source, token count, and packed (shard, bin) assignment."""
    return _stages(spark, sf_dir)["s6"]


@register(
    "pipeline_docs_stage_attrition",
    oracle=_PIPE_CTES + f"""
    SELECT '0_raw' AS stage, COUNT(*) AS n_docs FROM documents
    UNION ALL SELECT '1_exact_dedup', COUNT(*) FROM s1
    UNION ALL SELECT '2_near_dup', COUNT(*) FROM s2
    UNION ALL SELECT '3_quality', COUNT(*) FROM s3
    UNION ALL SELECT '4_decontaminated', COUNT(*) FROM s4
    UNION ALL SELECT '5_mixture', COUNT(*) FROM s5
    UNION ALL SELECT '6_packed_bins',
      COUNT(DISTINCT (shard, bin_in_shard)) FROM s6
    """,
    tags=("pipeline", "profiling"),
)
def pipeline_docs_stage_attrition(spark, sf_dir):
    """Row attrition per pipeline stage — the audit table a curation
    run logs (stage 6 reports the PACKED BIN count, i.e. the number of
    training sequences produced)."""
    st = _stages(spark, sf_dir)
    counts = [
        ("0_raw", st["raw"]), ("1_exact_dedup", st["s1"]),
        ("2_near_dup", st["s2"]), ("3_quality", st["s3"]),
        ("4_decontaminated", st["s4"]), ("5_mixture", st["s5"]),
    ]
    out = None
    for name, df in counts:
        c = df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )
        out = c if out is None else out.unionAll(c)
    bins = (
        st["s6"]
        .select("shard", "bin_in_shard")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.lit("6_packed_bins").alias("stage"), "n_docs")
    )
    return out.unionAll(bins)


# ------------------------------------------------- incremental face

# The NIGHTLY form of the pipeline: batches arrive over time, and the
# dedup stages consult digest STORES of everything already admitted
# instead of recomputing over the union — O(delta) per night. Quality
# is stateless (per-doc), so it runs first; exact then near-dup
# admission are the stateful store stages; packing is per-batch (each
# night packs its own new training shard).
def _build_inc_pipe_oracle() -> str:
    from .textplans import _INC_LSH_CTES, _STOPWORDS_SQL, _TOKS, _inc_batch_sql
    from .textplans import _NORM as _TNORM

    prelude = _INC_LSH_CTES + f""",
    qt AS (
      SELECT doc_id, doc_id % 3 AS bid, md5({_TNORM}) AS f, {_TOKS} AS toks,
             CASE WHEN length(text) > 0
                  THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
                  ELSE 0.0 END AS punct_r
      FROM documents
    ),
    qual AS MATERIALIZED (
      SELECT doc_id, bid, f, CAST(len(toks) AS BIGINT) AS n_tokens FROM (
        SELECT *,
               CASE WHEN len(toks) > 0
                    THEN CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE) / len(toks)
                    ELSE 0.0 END AS sw_r
        FROM qt
      )
      WHERE len(toks) >= {_MIN_TOKENS}
        AND least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0) * 0.4
            + greatest(0.0, 1.0 - punct_r * 4) * 0.3
            + least(sw_r * 5, 1.0) * 0.3 >= {_QUALITY_MIN}
    ),
    firstb AS (SELECT f, MIN(bid) AS fb FROM qual GROUP BY f),
    batched AS MATERIALIZED (
      SELECT MIN(q.doc_id) AS doc_id, q.bid AS bid
      FROM qual q JOIN firstb fb ON q.f = fb.f AND q.bid = fb.fb
      GROUP BY q.f, q.bid
    )"""
    return (
        "WITH RECURSIVE "
        + prelude
        + ","
        + _inc_batch_sql(0, None)
        + ","
        + _inc_batch_sql(1, "SELECT doc_id FROM adm0")
        + ","
        + _inc_batch_sql(2, "SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1")
        + """,
    admall AS (
      SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1
      UNION ALL SELECT doc_id FROM adm2
    ),
    fin AS (
      SELECT b.doc_id, b.bid, q.n_tokens
      FROM admall a
      JOIN batched b ON b.doc_id = a.doc_id
      JOIN qual q ON q.doc_id = a.doc_id
    )
    SELECT doc_id, CAST(bid AS INTEGER) AS batch_id, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / """
        + f"{_PACK_CAPACITY}.0) AS BIGINT) AS bin_in_batch"
        + """
    FROM fin
    WINDOW w AS (PARTITION BY bid ORDER BY doc_id)
    """
    )


@register(
    "pipeline_docs_incremental",
    oracle=_build_inc_pipe_oracle(),
    tags=("pipeline", "incremental", "dedup", "quality", "packing", "cross-snapshot"),
    driver=False,  # extended tier: evidence via the full-suite sweep
)
def pipeline_docs_incremental(spark, sf_dir):
    """The NIGHTLY incremental curation chain (r13): the corpus arrives
    as THREE batches (doc_id % 3 — batch order is not id order, so
    later nights genuinely collide with the stores); each batch runs
    quality filter → cross-snapshot EXACT dedup against the fingerprint
    store → cross-snapshot NEAR-dup admission against the LSH index
    store (operators/dedup.incremental_content_dedup /
    incremental_near_dup) → per-batch 2048-token packing. Per night the
    cost is O(new batch + its store collisions), never O(corpus) — the
    property that makes curation re-runnable nightly at 100 TB. The
    oracle replays all three nights in SQL: quality + first-batch-wins
    exact admission define the membership CTE, then the SAME per-batch
    LSH/Jaccard/components blocks the incremental near-dup face uses,
    then per-batch packing windows."""
    from ..operators import snapshots as _snap  # noqa: F401 (parity with sibling plans)
    from .workdirs import fresh_result_dir

    d = load_table(spark, sf_dir, "documents")
    q = d.where(
        (tx.token_count("text") >= _MIN_TOKENS)
        & (tx.quality_score("text") >= F.lit(_QUALITY_MIN))
    ).localCheckpoint(eager=False)
    exact_store = fresh_result_dir("inc_pipe_fp")
    nd_store = fresh_result_dir("inc_pipe_nd")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        parts = []
        for b in range(3):
            batch = q.where(F.pmod(F.col("doc_id"), F.lit(3)) == b)
            s1 = dedup.incremental_content_dedup(
                spark, batch, exact_store, writer_id="nightly", batch_id=b
            )
            s2 = dedup.incremental_near_dup(
                spark, s1, nd_store, writer_id="nightly", batch_id=b
            )
            parts.append(s2.withColumn("bid", F.lit(b)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    adm = parts[0]
    for p in parts[1:]:
        adm = adm.unionByName(p)
    adm = adm.select(
        "doc_id", F.col("bid").cast("int").alias("batch_id"),
        tx.token_count("text").cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("batch_id").orderBy("doc_id")
    prev_cum = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return adm.withColumn(
        "bin_in_batch",
        F.floor(prev_cum / F.lit(float(_PACK_CAPACITY))).cast("long"),
    )
