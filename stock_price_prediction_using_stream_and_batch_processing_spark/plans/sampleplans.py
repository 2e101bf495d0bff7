"""Deterministic sampling / splitting / packing query corpus — the
reproducibility layer of a training-data pipeline (north-star surface
alongside dedup + text analysis).

All decisions hash md5(id || salt) so Spark and the DuckDB oracle agree
bit-for-bit: Spark ``conv(substr(md5(x),1,8),16,10)`` == DuckDB
``('0x' || substr(md5(x),1,8))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as tx
from ..operators import dedup, sampling
from ..sources.tables import load_table
from .core import register
from .textplans import _TOKS  # DuckDB tokenizer fragment, lockstep with functions/text.py

# DuckDB twin of operators/sampling.hash_bucket
def _bucket_sql(expr: str, n: int, salt: str = "") -> str:
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR) || '{salt}'), 1, 8))::BIGINT % {n})"


@register(
    "hash_sample_docs",
    oracle=f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE {_bucket_sql('doc_id', 100)} < 5
    """,
    tags=("sampling", "deterministic", "filter"),
    driver=False,  # rotation r7: driver-green r5+r6; mixture/pack/split/deciles keep the sampling family's driver evidence
)
def hash_sample_docs(spark, sf_dir):
    """Deterministic 5% corpus sample — a pure hash filter (no shuffle,
    no randomness; same rows survive on every engine and partitioning,
    unlike ``df.sample``)."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.hash_sample(d, "doc_id", 5).select("doc_id", "source", "lang")


@register(
    "train_val_test_split_docs",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_bucket_sql('doc_id', 100)} < 90 THEN 'train'
                WHEN {_bucket_sql('doc_id', 100)} < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("sampling", "split", "deterministic"),
    # r12 rotation: 7 straight driver greens (r5-r11) -> extended tier
    # frees a driver slot for a never-checked face
    driver=False,
)
def train_val_test_split_docs(spark, sf_dir):
    """Stable 90/5/5 train/val/test assignment by id hash — rows never
    migrate between splits as the corpus grows (eval-set hygiene)."""
    d = load_table(spark, sf_dir, "documents")
    return sampling.train_val_test_split(d, "doc_id", 90, 5).select("doc_id", "split")


@register(
    "pack_docs_bins",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             {_bucket_sql('doc_id', 8)} AS shard,
             len({_TOKS}) AS n_tokens
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 2048.0) AS BIGINT) AS bin_in_shard,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM sized
    WINDOW w AS (PARTITION BY shard ORDER BY doc_id)
    """,
    tags=("sampling", "packing", "window"),
    # r12 rotation: 7 straight driver greens (r5-r11) -> extended tier
    # frees a driver slot for a never-checked face
    driver=False,
)
def pack_docs_bins(spark, sf_dir):
    """Context-window packing: shard by id hash, pack each shard's docs
    (id order) into 2048-token bins by running token count — the
    distributed form of pretraining sequence packing (one shuffle, per-
    shard window sums, no global sort)."""
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("n_tokens", tx.token_count("text").cast("long"))
    packed = sampling.pack_greedy(d, "doc_id", "n_tokens", capacity=2048, n_shards=8)
    return packed.select("doc_id", "shard", "bin_in_shard", "n_tokens")


@register(
    "simhash_near_pairs_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
                     THEN [] ELSE string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') END) AS tok
      FROM documents
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks),
    votes AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN (hv >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h CROSS JOIN (SELECT unnest(range(60)) AS bit) b
      GROUP BY doc_id, b.bit
    ),
    sigs AS (
      SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("dedup", "simhash", "near-dup"),
    driver=False,  # rotation r7: driver-green r4-r6; family keeps other driver rows
)
def simhash_near_pairs_docs(spark, sf_dir):
    """SimHash near-dup PAIRS (Hamming <= 3) over 60-bit signatures:
    candidates via pigeonhole block equi-join (distance<=k pairs share
    >=1 of k+1 blocks — never an all-pairs cross), verified by
    bit_count(xor). 60-bit/15-bit blocks give 32k buckets per block
    index, so within-bucket collisions are real near-dups, not corpus
    mass (the 32-bit/8-bit variant probed 13x at 10x docs — quadratic
    in its 256 buckets; see SCALE.md). The oracle does the O(n²) join
    the Spark plan avoids, so the check also proves the blocking loses
    no pairs on this corpus."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(d, "text", "doc_id", bits=60, max_hamming=3)


# word 8-gram shingles (distinct), lockstep with text.word_shingles(n=8)
_SHINGLES8 = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKS}) - 8, 0) + 2), "
    f"i -> array_to_string(list_slice({_TOKS}, i, i + 7), ' ')))"
)


@register(
    "decontaminate_train_eval",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({_SHINGLES8}) AS s FROM documents),
    e AS (SELECT doc_id AS eval_id, s FROM sh WHERE {_bucket_sql('doc_id', 100)} < 5),
    t AS (SELECT doc_id AS train_id, s FROM sh WHERE {_bucket_sql('doc_id', 100)} >= 5)
    SELECT train_id, eval_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
    FROM t JOIN e USING (s)
    GROUP BY train_id, eval_id
    """,
    tags=("sampling", "decontamination", "dedup", "broadcast-join"),
    # rotation r6: driver-green r4+r5; the sampling family keeps six
    # driver rows (hash/split/pack/stratified/mixture/weighted)
    driver=False,
)
def decontaminate_train_eval(spark, sf_dir):
    """Eval-set decontamination: train docs sharing any word 8-gram with
    the (hash-split) eval set — the cross-corpus dedup step every
    benchmark-honest training pipeline runs. The eval side is small by
    construction, so it BROADCASTS and the 100 TB train side joins
    without shuffling; the join carries md5 digests, not text."""
    d = load_table(spark, sf_dir, "documents")
    b = sampling.hash_bucket("doc_id", 100)
    eval_df = d.filter(b < 5)
    train_df = d.filter(b >= 5)
    return dedup.ngram_contamination(train_df, eval_df, "text", "doc_id", shingle_n=8)


@register(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_bucket_sql('doc_id', 100)} <
          CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 80
                    WHEN 'es' THEN 50 WHEN 'de' THEN 50 WHEN 'fr' THEN 50
                    ELSE 0 END
    """,
    tags=("sampling", "stratified", "deterministic"),
    driver=False,  # rotation r7: driver-green r5+r6; mixture/pack/split/deciles keep the sampling family's driver evidence
)
def stratified_sample_docs(spark, sf_dir):
    """Corpus-mixture re-balancing: per-language deterministic sampling
    rates (downsample dominant en to 20%, keep 80% of low-resource zh)
    — a pure hash filter, no shuffle, reproducible across engines
    (unlike ``df.sampleBy``)."""
    d = load_table(spark, sf_dir, "documents")
    rates = {"en": 20, "zh": 80, "es": 50, "de": 50, "fr": 50}
    return sampling.stratified_hash_sample(d, "doc_id", "lang", rates).select("doc_id", "lang")


@register(
    "mixture_resample_docs",
    oracle=f"""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    t(source, t) AS (VALUES ('src1', CAST(2.0 AS DOUBLE)), ('src2', CAST(1.0 AS DOUBLE)),
                            ('src3', CAST(1.0 AS DOUBLE)), ('src4', CAST(0.5 AS DOUBLE))),
    r AS (SELECT c.source, t.t / c.n AS ratio FROM c JOIN t USING (source)),
    m AS (SELECT MAX(ratio) AS mx FROM r),
    thr AS (SELECT source, CAST(FLOOR(1000000.0 * ratio / mx) AS BIGINT) AS thr
            FROM r CROSS JOIN m)
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr USING (source)
    WHERE {_bucket_sql('doc_id', 1000000)} < thr
    """,
    tags=("sampling", "mixture", "deterministic"),
    driver=False,  # rotation r7: driver-green r5-r6; train_val_test_split + pack_docs_bins keep the sampling family's driver evidence
)
def mixture_resample_docs(spark, sf_dir):
    """Domain-mixture resampling to target weights src1:src2:src3:src4
    = 2:1:1:0.5 (operators/sampling.mixture_resample): per-source
    counts -> acceptance thresholds (largest-corpus-preserving) ->
    deterministic hash filter. Sources outside the target mix drop
    out."""
    d = load_table(spark, sf_dir, "documents")
    out = sampling.mixture_resample(
        d, "source", "doc_id", {"src1": 2.0, "src2": 1.0, "src3": 1.0, "src4": 0.5}
    )
    return out.select("doc_id", "source")


@register(
    "doc_length_decile_stats",
    oracle=f"""
    WITH s AS (SELECT doc_id, CAST(len({_TOKS}) AS DOUBLE) AS n_tokens FROM documents),
    q AS (SELECT quantile_cont(n_tokens, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS thr FROM s),
    b AS (
      SELECT s.doc_id, s.n_tokens,
             1 + len(list_filter(q.thr, t -> s.n_tokens > t)) AS decile
      FROM s CROSS JOIN q
    )
    SELECT CAST(decile AS INTEGER) AS decile, COUNT(*) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM b GROUP BY decile
    """,
    tags=("sampling", "quantile", "binning"),
    # r12 rotation: 7 straight driver greens (r5-r11) -> extended tier
    # frees a driver slot for a never-checked face
    driver=False,
)
def doc_length_decile_stats(spark, sf_dir):
    """Token-length decile binning WITHOUT a global sort (operators/
    quality.percentile_bins): exact interpolated decile thresholds from
    one aggregate, broadcast back, bin = count of thresholds below —
    vs the naive single-task NTILE() OVER (ORDER BY n). The per-decile
    stats drive curriculum ordering / packing-capacity choices."""
    from ..functions import text as tx
    from ..operators import quality

    d = load_table(spark, sf_dir, "documents")
    s = d.select("doc_id", tx.token_count("text").cast("double").alias("n_tokens"))
    binned = quality.percentile_bins(s, "n_tokens", out="decile")
    return binned.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )


@register(
    "weighted_sample_events",
    oracle="""
    WITH w AS (
      SELECT event_id, event_type,
             -ln((('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                 / 1152921504606846976.0) / (ABS(value) + 1.0) AS k
      FROM events
      WHERE value IS NOT NULL AND ABS(value) + 1.0 > 0
    ), r AS (
      SELECT event_id, event_type,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY k, event_id) AS INTEGER)
               AS sample_rank
      FROM w
    )
    SELECT event_id, event_type, sample_rank FROM r WHERE sample_rank <= 25
    """,
    tags=("sampling", "weighted", "deterministic", "reservoir"),
    driver=False,  # rotation r7: driver-green r5+r6; mixture/pack/split/deciles keep the sampling family's driver evidence
)
def weighted_sample_events(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES
    as a rank query): 25 events per type, survival probability
    proportional to |value|+1, fully deterministic — u derives from
    md5(event_id), so the same rows survive on any engine or
    partitioning (operators/sampling.weighted_hash_sample)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = sampling.weighted_hash_sample(
        ev, "event_id", F.abs(F.col("value")) + F.lit(1.0), m=25, strata_col="event_type"
    )
    return out.select("event_id", "event_type", "sample_rank")
