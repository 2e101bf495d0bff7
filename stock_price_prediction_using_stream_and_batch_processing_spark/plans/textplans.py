"""Text-analysis + dedup query corpus over the ``documents`` table
(north-star LLM-pipeline operators): token counting, quality scoring,
language ID, fingerprinting, MinHash/SimHash signatures, LSH candidate
pairs, n-gram Jaccard near-dup.

Oracle portability notes (why these SQL strings look the way they do):
- All content hashes are md5 (identical across Spark/DuckDB/Python).
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all semantics.
- Spark ``conv(hex,16,10)`` == DuckDB ``('0x'||hex)::BIGINT``.
- The documents corpus DOES contain planted near-duplicates (~25 pairs
  at sf0.01 with 3-gram Jaccard 0.9-0.99): the LSH pair queries find
  them and the oracle verifies the exact pair set. Operator mechanics
  are additionally proven on constructed fixtures in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup, textops
from ..sources.tables import load_table
from .core import register

# Shared DuckDB SQL fragments (kept in lockstep with functions/text.py).
_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = f"CASE WHEN {_NORM} = '' THEN [] ELSE string_split({_NORM}, ' ') END"
_STOPWORDS_SQL = "['the','of','and','to','in','a','is','that','it','for','on','with','as','was','at','by','an','be','this','are']"
# word 3-gram shingles, distinct, matching functions/text.word_shingles
_SHINGLES = (
    f"list_distinct(list_transform(range(1, greatest(len({_TOKS}) - 3, 0) + 2), "
    f"i -> array_to_string(list_slice({_TOKS}, i, i + 2), ' ')))"
)


@register(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual
    FROM documents
    """,
    tags=("text", "tokens"),
    driver=False,
)
def doc_token_stats(spark, sf_dir):
    """Token counting, whitespace + BPE-ish regex sub-word counts
    (north-star token counting; all JVM-side regex/array ops)."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions import text as tx

    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.bpe_ish_token_count("text").cast("int").alias("n_bpe_tokens"),
        tx.char_count("text").cast("int").alias("n_chars_actual"),
    )


@register(
    "doc_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks,
             CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) AS n_punct
      FROM documents
    ), r AS (
      SELECT doc_id,
             CASE WHEN length(text) > 0 THEN n_punct / length(text) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS stopword_ratio,
             CAST(len(toks) AS DOUBLE) AS n_toks
      FROM t
    )
    SELECT doc_id, ROUND(punct_ratio, 6) AS punct_ratio, ROUND(stopword_ratio, 6) AS stopword_ratio,
           ROUND(least(n_toks / 20.0, 1.0) * 0.4
                 + greatest(0.0, 1.0 - punct_ratio * 4) * 0.3
                 + least(stopword_ratio * 5, 1.0) * 0.3, 6) AS quality
    FROM r
    """,
    tags=("text", "quality"),
    driver=False,
)
def doc_quality(spark, sf_dir):
    """Composite quality score (length band + punctuation + stopword
    signal) — the LLM-corpus quality-filter shape, all native exprs;
    one regex pass per row (operators/textops.quality_features)."""
    d = load_table(spark, sf_dir, "documents")
    return textops.quality_features(d)


@register(
    "doc_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CASE WHEN len(toks) > 0
                     AND CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE) / len(toks) >= 0.08
                THEN 'en' ELSE 'und' END AS lang_pred
    FROM t
    """,
    tags=("text", "langid"),
    driver=False,
)
def doc_lang_id(spark, sf_dir):
    """Stopword-ratio language ID heuristic."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions import text as tx

    return d.select("doc_id", tx.lang_id("text").alias("lang_pred"))


@register(
    "doc_fingerprint",
    oracle=f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents",
    tags=("text", "fingerprint", "dedup"),
    driver=False,
)
def doc_fingerprint(spark, sf_dir):
    """Normalized-content md5 fingerprint per doc (exact-dedup key)."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions import hashing

    return d.select("doc_id", hashing.fingerprint("text").alias("fingerprint"))


@register(
    "content_dedup_docs",
    oracle=f"""
    WITH fp AS (SELECT doc_id, md5({_NORM}) AS f FROM documents)
    SELECT f AS fingerprint, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM fp GROUP BY f
    """,
    tags=("dedup", "text"),
    driver=False,
)

def content_dedup_docs(spark, sf_dir):
    """Exact content dedup summary: one keeper (min doc_id) per distinct
    normalized content — the 100 TB shape (shuffle carries digests only)."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions import hashing

    return (
        d.select("doc_id", hashing.fingerprint("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


@register(
    "token_freq_top100",
    oracle=f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS token FROM documents)
    SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ORDER BY cnt DESC, token LIMIT 100
    """,
    tags=("text", "tokens", "groupby"),
    driver=False,
)

def token_freq_top100(spark, sf_dir):
    """Corpus token frequencies (canonical word-count plan) + top-k."""
    d = load_table(spark, sf_dir, "documents")
    freq = textops.token_frequencies(d)
    return freq.orderBy(F.col("cnt").desc(), F.col("token")).limit(100)


@register(
    "minhash_signatures_docs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents WHERE len({_TOKS}) > 0
    ),
    d AS (SELECT doc_id, md5('0:' || sh) AS d0, md5('1:' || sh) AS d1 FROM sh)
    SELECT doc_id,
           MIN(substr(d0, 1, 8)) AS mh_0, MIN(substr(d0, 9, 8)) AS mh_1,
           MIN(substr(d0, 17, 8)) AS mh_2, MIN(substr(d0, 25, 8)) AS mh_3,
           MIN(substr(d1, 1, 8)) AS mh_4, MIN(substr(d1, 9, 8)) AS mh_5,
           MIN(substr(d1, 17, 8)) AS mh_6, MIN(substr(d1, 25, 8)) AS mh_7
    FROM d GROUP BY doc_id
    """,
    tags=("dedup", "minhash", "text"),
    driver=False,
)
def minhash_signatures_docs(spark, sf_dir):
    """MinHash signatures: 8 min-hashes over word 3-gram shingles — four
    independent 32-bit functions per md5 digest, two digests per shingle
    (operators/dedup.minhash_signatures)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signatures(d, "text", "doc_id", num_hashes=8)


@register(
    "minhash_lsh_pairs_docs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents WHERE len({_TOKS}) > 0
    ),
    d AS (SELECT doc_id, md5('0:' || sh) AS d0, md5('1:' || sh) AS d1 FROM sh),
    sig AS MATERIALIZED (
      SELECT doc_id, s.seed,
             MIN(substr(CASE WHEN s.seed < 4 THEN d0 ELSE d1 END,
                        CAST((s.seed % 4) * 8 + 1 AS INTEGER), 8)) AS mh
      FROM d CROSS JOIN (SELECT unnest(range(8)) AS seed) s
      GROUP BY doc_id, s.seed
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, CAST(seed // 2 AS INTEGER) AS band,
             md5(CAST(seed // 2 AS VARCHAR) || '|' || string_agg(mh, '|' ORDER BY seed)) AS band_key
      FROM sig GROUP BY doc_id, seed // 2
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
    tags=("dedup", "minhash", "lsh"),
    driver=False,
)
def minhash_lsh_pairs_docs(spark, sf_dir):
    """MinHash-LSH near-dup candidates: 8 hashes banded 4×2; pairs share
    any band. Band-bucket equi-join — never all-pairs."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, "text", "doc_id", num_hashes=8, bands=4)


@register(
    "ngram_jaccard_pairs_docs",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, md5(unnest({_SHINGLES})) AS sh
      FROM documents WHERE len({_TOKS}) > 0
    ),
    sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
    """,
    tags=("dedup", "jaccard"),
    driver=False,
)

def ngram_jaccard_pairs_docs(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (threshold 0.8): shingle-hash
    self-join carrying 16-byte digests, not text."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.8).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


@register(
    "near_dup_filter_docs",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents WHERE len({_TOKS}) > 0
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
    edges AS (
      SELECT id_a AS s, id_b AS t FROM ver UNION SELECT id_b, id_a FROM ver
    ),
    reach(node, lab) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lab FROM edges e JOIN reach r ON e.t = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS lab FROM reach GROUP BY node)
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT node FROM comp WHERE lab < node)
    """,
    tags=("dedup", "minhash", "lsh", "jaccard", "components", "pipeline"),
    # rotation r11: 7x driver-green (r4-r10) — slot goes to never-checked faces
    driver=False,
)
def near_dup_filter_docs(spark, sf_dir):
    """End-to-end near-dup corpus removal (operators/dedup.
    near_dup_filter): LSH candidates → candidate-restricted exact
    Jaccard ≥ 0.8 → connected components → keep min-id representative
    per cluster. The oracle recomputes the whole pipeline in SQL with a
    recursive CTE for the components, so the differential checks the
    composition, not just the stages."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.near_dup_filter(d, "text", "doc_id", num_hashes=8, bands=4)


@register(
    "simhash_docs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM toks),
    votes AS (
      SELECT doc_id, b.bit,
             SUM(CASE WHEN (hv >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h CROSS JOIN (SELECT unnest(range(32)) AS bit) b
      GROUP BY doc_id, b.bit
    )
    SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
    tags=("dedup", "simhash"),
    driver=False,
)
def simhash_docs(spark, sf_dir):
    """32-bit SimHash per doc — bitwise majority vote over token hashes,
    one shuffle keyed by doc."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash(d, "text", "doc_id")


@register(
    "doc_profile",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks,
             CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) AS n_punct
      FROM documents
    ), r AS (
      SELECT doc_id, text, toks,
             CASE WHEN length(text) > 0 THEN n_punct / length(text) ELSE 0.0 END AS punct_ratio,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS stopword_ratio
      FROM t
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_subword_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual,
           ROUND(punct_ratio, 6) AS punct_ratio,
           ROUND(stopword_ratio, 6) AS stopword_ratio,
           ROUND(least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0) * 0.4
                 + greatest(0.0, 1.0 - punct_ratio * 4) * 0.3
                 + least(stopword_ratio * 5, 1.0) * 0.3, 6) AS quality,
           CASE WHEN len(toks) > 0 AND stopword_ratio >= 0.08 THEN 'en' ELSE 'und' END AS lang_pred,
           md5({_NORM}) AS fingerprint
    FROM r
    """,
    tags=("text", "profile"),
    driver=False,
)
def doc_profile(spark, sf_dir):
    """The one-pass document profile (operators/textops.text_profile):
    every text-quality feature in a single projection — the shape a
    corpus-filtering pipeline runs before routing/filtering decisions."""
    d = load_table(spark, sf_dir, "documents")
    prof = textops.text_profile(d)
    return prof.withColumn("n_subword_tokens", F.col("n_subword_tokens").cast("int")).withColumn(
        "n_chars_actual", F.col("n_chars_actual").cast("int")
    )


@register(
    "doc_winnow_fingerprints",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_NORM} AS nm FROM documents WHERE length({_NORM}) >= 8
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(substr(nm, CAST(i AS INTEGER), 8)), 1, 8))::BIGINT AS h,
             length(nm) - 8 + 1 AS npos
      FROM d, UNNEST(range(1, length(nm) - 8 + 2)) AS t(i)
    ),
    sel AS (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM grams WHERE pos <= npos - 4 + 1
    )
    SELECT DISTINCT doc_id, fp FROM sel
    """,
    tags=("text", "fingerprint", "winnowing", "dedup"),
    driver=False,
)
def doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing (rolling-hash) fingerprints, k=8 char-grams, window 4
    (operators/textops.winnowed_fingerprints): local-similarity
    fingerprints guaranteeing any shared run of length >= 11 chars
    shares a fingerprint — the MOSS algorithm, per-doc window mins over
    one doc-keyed shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return textops.winnowed_fingerprints(d, "text", "doc_id", k=8, window=4)


@register(
    "doc_repetition_docs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY doc_id, tok
    ),
    top AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total, COUNT(*) AS n_distinct
      FROM tf GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id, len(toks) AS n,
             len(list_distinct(CASE WHEN len(toks) >= 2
                 THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                 ELSE list_transform(toks, x -> x) END)) AS bg_distinct
      FROM t
    )
    SELECT bg.doc_id,
           ROUND(CASE WHEN total > 0 THEN 1.0 - CAST(n_distinct AS DOUBLE) / total ELSE 0.0 END, 6) AS dup_token_frac,
           ROUND(CASE WHEN total > 0 THEN CAST(top_c AS DOUBLE) / total ELSE 0.0 END, 6) AS top_token_frac,
           ROUND(CASE WHEN n >= 2 THEN 1.0 - CAST(bg_distinct AS DOUBLE) / (n - 1) ELSE 0.0 END, 6) AS dup_bigram_frac
    FROM bg LEFT JOIN top ON bg.doc_id = top.doc_id
    """,
    tags=("text", "quality", "repetition"),
    driver=False,
)
def doc_repetition_docs(spark, sf_dir):
    """Within-doc repetition filters (operators/textops.
    repetition_features): duplicate-token, top-token and
    duplicate-bigram fractions — the Gopher-style boilerplate/
    degeneration catchers a curation pipeline runs corpus-wide."""
    d = load_table(spark, sf_dir, "documents")
    return textops.repetition_features(d)


@register(
    "tf_idf_docs",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok AS token, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    dft AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf,
           ROUND(ln((1.0 + n_docs) / (1.0 + df)) + 1.0, 6) AS idf,
           ROUND(tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 6) AS tf_idf
    FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN n
    """,
    tags=("text", "tfidf", "ranking"),
    driver=False,
)
def tf_idf_docs(spark, sf_dir):
    """TF-IDF weights per (doc, token) with smoothed idf
    (operators/textops.tf_idf): the vectorization pass behind corpus
    search / keyword extraction. Integer-exact inputs make the
    cross-engine differential stable."""
    d = load_table(spark, sf_dir, "documents")
    return textops.tf_idf(d)


# Terms chosen from the synthetic corpus vocabulary; BM25 mechanics are
# term-agnostic.
_BM25_TERMS = ("spark", "join", "stream")
_BM25_TERMS_SQL = "['" + "','".join(_BM25_TERMS) + "']"


@register(
    "bm25_topk_docs",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, len({_TOKS}) AS dl,
             list_filter({_TOKS}, x -> list_contains({_BM25_TERMS_SQL}, x)) AS hits
      FROM documents
    ),
    corpus AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, dl, tok AS token, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(hits) AS tok FROM dl)
      GROUP BY doc_id, dl, tok
    ),
    dft AS (SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token)
    SELECT doc_id,
           ROUND(SUM(ln(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
                     * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS bm25
    FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN corpus
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 100
    """,
    tags=("text", "bm25", "ranking", "topk"),
    driver=False,
)
def bm25_topk_docs(spark, sf_dir):
    """Top-100 documents by BM25 relevance to a fixed query-term bag
    (operators/textops.bm25_scores, k1=1.2, b=0.75): the retrieval
    scorer a RAG/data-curation pipeline runs corpus-wide. The explode
    is pre-filtered to query-term hits, so shuffled rows are O(hits)
    not O(tokens)."""
    d = load_table(spark, sf_dir, "documents")
    return textops.bm25_scores(d, list(_BM25_TERMS), top_k=100)


@register(
    "doc_surprisal_docs",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    freq AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM freq)
    SELECT doc_id, ROUND(-AVG(ln(CAST(cnt AS DOUBLE) / total)), 6) AS surprisal_nats
    FROM tok JOIN freq USING (token) CROSS JOIN tot
    GROUP BY doc_id
    """,
    tags=("text", "quality", "language-model"),
    # r12 rotation: 7 straight driver greens (r5-r11) -> extended tier
    # frees the driver slot for snapshot_equality_delete_orders
    driver=False,
)
def doc_surprisal_docs(spark, sf_dir):
    """Mean unigram surprisal per document under the corpus's own
    distribution (operators/textops.unigram_surprisal) — the
    perplexity-filter shape for corpus quality routing."""
    d = load_table(spark, sf_dir, "documents")
    return textops.unigram_surprisal(d)


@register(
    "chunk_docs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents WHERE len({_TOKS}) > 0),
    s AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS st FROM t
    )
    SELECT doc_id, CAST(st // 48 AS INTEGER) AS chunk_id,
           array_to_string(list_slice(toks, CAST(st + 1 AS INTEGER), CAST(st + 64 AS INTEGER)), ' ') AS chunk_text,
           CAST(len(list_slice(toks, CAST(st + 1 AS INTEGER), CAST(st + 64 AS INTEGER))) AS INTEGER) AS n_chunk_tokens
    FROM s
    """,
    tags=("text", "chunking", "rag"),
    driver=False,
)
def chunk_docs(spark, sf_dir):
    """Fixed-window document chunking with overlap (operators/textops.
    chunk_documents, 64-token chunks / 16-token overlap): the
    RAG-indexing / pretraining splitter, shuffle-free (tokens -> start
    sequence -> slice/join -> posexplode)."""
    d = load_table(spark, sf_dir, "documents")
    return textops.chunk_documents(d, chunk_tokens=64, overlap=16)


@register(
    "pii_redact_docs",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '[PHONE]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g') AS text_redacted,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS INTEGER) AS n_phone,
           CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ipv4
    FROM documents
    """,
    tags=("text", "pii", "redaction"),    driver=False,  # rotation r7: driver-green r5-r6; the text-quality family holds several other driver rows
)
def pii_redact_docs(spark, sf_dir):
    """PII scrub over the corpus: email/phone/IPv4 -> typed placeholders
    + per-type counts, one JVM-side regex cascade per row (the
    pre-training privacy pass; patterns are RE2-safe so the DuckDB
    oracle runs the identical cascade). The synthetic corpus carries no
    PII — the differential still proves the two engines' regex
    semantics agree on every document; planted-PII behavior is pinned
    in tests/test_sampling.py."""
    d = load_table(spark, sf_dir, "documents")
    return textops.redact_pii(d, "text", "doc_id")


@register(
    "collocation_pmi_docs",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    uni AS (SELECT unnest(t) AS token FROM toks),
    uc AS (SELECT token, COUNT(*) AS c FROM uni GROUP BY token),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM uni),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks WHERE len(t) >= 2
    ),
    bc AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram),
    btot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM bg)
    SELECT bc.bigram, bc.c AS n_pair,
           ROUND(LN((bc.c / btot.m) / ((u1.c / tot.n) * (u2.c / tot.n))), 6) AS pmi
    FROM bc
    CROSS JOIN btot CROSS JOIN tot
    JOIN uc u1 ON string_split(bc.bigram, ' ')[1] = u1.token
    JOIN uc u2 ON string_split(bc.bigram, ' ')[2] = u2.token
    WHERE bc.c >= 3
    ORDER BY pmi DESC, bc.bigram LIMIT 50
    """,
    tags=("text", "collocation", "pmi"),
    # rotation r6: driver-green r4+r5; doc_bigram_surprisal +
    # heavy_hitter_tokens keep the corpus-statistics driver evidence
    driver=False,
)
def collocation_pmi_docs(spark, sf_dir):
    """Top-50 bigram collocations by pointwise mutual information —
    the corpus-statistics pass behind phrase mining / tokenizer-merge
    candidates. The tokenization regex (the dominant per-row cost) runs
    in ONE corpus scan: the token-array projection is localCheckpoint'd
    and unigram counts, bigram counts, and BOTH corpus totals derive
    from it (totals are sums over the count tables — no rescans).
    The count tables are checkpointed too, so the final two token-keyed
    joins and the totals reuse one aggregation each. Top-k is
    TakeOrderedAndProject. PMI arithmetic mirrors the oracle
    operation-for-operation so the doubles are bit-identical."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions import text as tx

    tokd = d.select(tx.tokens(F.col("text")).alias("t")).localCheckpoint(eager=False)
    t = F.col("t")
    n = F.size(t)
    bigram_arr = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i + 1), F.element_at(t, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))

    uni = tokd.select(F.explode("t").alias("token"))
    uc = uni.groupBy("token").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=False)
    tot = uc.agg(F.sum("c").cast("double").alias("n"))

    bg = tokd.select(F.explode(bigram_arr).alias("bigram"))
    bc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=False)
    btot = bc.agg(F.sum("c").cast("double").alias("m"))

    u1 = uc.select(F.col("token").alias("_t1"), F.col("c").alias("_c1"))
    u2 = uc.select(F.col("token").alias("_t2"), F.col("c").alias("_c2"))
    scored = (
        bc.filter(F.col("c") >= 3)
        .crossJoin(F.broadcast(btot))
        .crossJoin(F.broadcast(tot))
        .join(u1, F.split(F.col("bigram"), " ").getItem(0) == F.col("_t1"))
        .join(u2, F.split(F.col("bigram"), " ").getItem(1) == F.col("_t2"))
        .select(
            "bigram",
            F.col("c").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c") / F.col("m"))
                    / ((F.col("_c1") / F.col("n")) * (F.col("_c2") / F.col("n")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), F.col("bigram")).limit(50)


@register(
    "edit_distance_pairs_docs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents WHERE len({_TOKS}) > 0
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
    )
    SELECT id_a, id_b, CAST(levenshtein(ta.text, tb.text) AS INTEGER) AS edit_dist
    FROM cand
    JOIN documents ta ON ta.doc_id = cand.id_a
    JOIN documents tb ON tb.doc_id = cand.id_b
    WHERE levenshtein(ta.text, tb.text) <= 20
    """,
    tags=("dedup", "levenshtein", "lsh", "verify"),
    # rotation r6: driver-green r4+r5; the dedup family keeps ample
    # driver evidence (near_dup_filter, simhash, both incrementals)
    driver=False,
)
def edit_distance_pairs_docs(spark, sf_dir):
    """Character-level near-dup verification: MinHash-LSH candidates
    (8 hashes, 4 bands) confirmed by exact Levenshtein ≤ 20. The DP
    runs ONLY on banded candidates, behind a length gate, with Spark's
    threshold-banded levenshtein (O(L·k) not O(L²)) — the verifier
    drops LSH's false-positive pairs while scanning no extra text
    (operators/dedup.edit_distance_pairs)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.edit_distance_pairs(d, "text", "doc_id", max_dist=20, num_hashes=8, bands=4)


@register(
    "intra_doc_dedup_docs",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, unnest({_TOKS}) AS tok, generate_subscripts({_TOKS}, 1) AS pos
      FROM documents
    ),
    g AS MATERIALIZED (
      SELECT doc_id, pos, tok,
             CASE WHEN COUNT(*) OVER win3 = 3
                  THEN string_agg(tok, ' ') OVER win3 END AS gram
      FROM t
      WINDOW win3 AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
    ),
    r AS MATERIALIZED (
      SELECT doc_id, pos, tok,
             CASE WHEN gram IS NOT NULL
                       AND pos > MIN(pos) OVER (PARTITION BY doc_id, gram)
                  THEN 1 ELSE 0 END AS rep
      FROM g
    ),
    m AS MATERIALIZED (
      SELECT doc_id, pos, tok,
             MAX(rep) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1 AS removed
      FROM r
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT removed), '') AS clean_text
      FROM m GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           COALESCE(a.n_removed, 0) AS n_removed,
           COALESCE(a.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
    tags=("dedup", "intra-doc", "ngram", "rewrite"),
    # rotation r12: driver-green r6-r11 (6 straight); the dedup family
    # keeps duplicate_passages + incremental_near_dup + cosine_topk_lsh
    driver=False,
)
def intra_doc_dedup_docs(spark, sf_dir):
    """INTRA-document n-gram dedup — the rewrite face of repetition
    handling (operators/textops.remove_repeated_ngrams): tokens covered
    by a word 3-gram whose exact text occurred earlier in the SAME
    document are removed and the cleaned normalized-space text is
    rebuilt; `doc_repetition_docs` SCORES repetition, this one REMOVES
    it (the intra-doc companion of corpus-level near_dup_filter —
    production pipelines use larger n over the same mechanics). Every
    doc comes back (empty/clean docs with n_removed=0), and the oracle
    replays the full positional definition — gram windows, earliest
    occurrence, span coverage, rebuild — in SQL."""
    from ..operators import textops

    d = load_table(spark, sf_dir, "documents")
    out = textops.remove_repeated_ngrams(d, "text", "doc_id", n=3)
    return (
        d.select("doc_id")
        .join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


@register(
    "hard_negative_pairs_docs",
    oracle=f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents WHERE len({_TOKS}) > 0
    ),
    dg AS MATERIALIZED (SELECT doc_id, md5('0:' || sh) AS d0 FROM sh),
    sig AS MATERIALIZED (
      SELECT doc_id, s.seed,
             MIN(substr(d0, CAST(s.seed * 8 + 1 AS INTEGER), 8)) AS mh
      FROM dg CROSS JOIN (SELECT unnest(range(4)) AS seed) s
      GROUP BY doc_id, s.seed
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, md5(CAST(seed AS VARCHAR) || '|' || mh) AS band_key FROM sig
    ),
    capped AS MATERIALIZED (
      -- replay of the Spark-side max_bucket_size=64 guard
      -- (operators/maintenance.cap_bucket_size): drop over-cap band
      -- buckets entirely, so the two engines agree for ANY fixture,
      -- including a regenerated one with a >64-member bucket
      SELECT * FROM bands WHERE band_key NOT IN (
        SELECT band_key FROM bands GROUP BY band_key HAVING COUNT(*) > 64)
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM capped a JOIN capped b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    shd AS MATERIALIZED (SELECT DISTINCT doc_id, md5(sh) AS s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS ninter
      FROM cand c
      JOIN shd a ON a.doc_id = c.id_a
      JOIN shd b ON b.doc_id = c.id_b AND b.s = a.s
      GROUP BY c.id_a, c.id_b
    ),
    jac AS (
      SELECT i.id_a, i.id_b,
             CAST(i.ninter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.ninter) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
    )
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.0 AND jaccard < 0.8
    """,
    tags=("training-data", "hard-negatives", "minhash", "lsh", "contrastive"),
    # rotation r12: driver-green r6-r11 (6 straight); the dedup/LSH
    # family keeps incremental_near_dup + cosine_topk_lsh + intra_doc
    # + duplicate_passages driver rows
    driver=False,
)
def hard_negative_pairs_docs(spark, sf_dir):
    """Hard-negative mining for contrastive training
    (operators/dedup.hard_negative_pairs): document pairs that share a
    single-hash MinHash band (lexically adjacent — a single MinHash
    collides with probability exactly J, so 1-hash bands surface the
    moderate-overlap pairs the dedup pipeline's J≥0.8-tuned bands never
    fire on) but whose exact shingle Jaccard is BELOW the near-dup
    threshold — the "similar but distinct" pairs an embedding model
    learns the most from, and the exact complement of what
    near_dup_filter removes. The oracle replays signatures, banding,
    the candidate equi-join, and the verification Jaccard; the raw
    jaccard column is a single integer division, bit-identical across
    engines."""
    d = load_table(spark, sf_dir, "documents")
    # max_bucket_size=64: single-hash bands are the most
    # boilerplate-sensitive banding (every doc whose argmin shingle is
    # a template's lands in one bucket), so the mega-bucket guard is
    # wired here exactly as in the incremental near-dup store join.
    # The oracle replays the SAME cap (capped CTE), so the differential
    # stays valid even for a regenerated fixture whose densest bucket
    # crosses 64 (measured max 22 at sf0.1, 5 at sf0.01 today).
    return dedup.hard_negative_pairs(
        d, "text", "doc_id", num_hashes=4, bands=4,
        min_jaccard=0.0, max_jaccard=0.8, max_bucket_size=64,
    )


@register(
    "doc_bigram_surprisal",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    pairs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> {{'prev': toks[i], 'cur': toks[i + 1]}}),
                    recursive := true)
      FROM t WHERE len(toks) >= 2
    ),
    big AS (SELECT prev, cur, COUNT(*) AS c2 FROM pairs GROUP BY prev, cur),
    ctx AS (SELECT prev, SUM(c2) AS c_ctx FROM big GROUP BY prev),
    uni AS (SELECT cur, COUNT(*) AS c1
            FROM (SELECT unnest(toks) AS cur FROM t) GROUP BY cur),
    tot AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n FROM uni)
    SELECT doc_id,
           ROUND(-AVG(ln(0.8 * c2 / c_ctx + 0.2 * c1 / n)), 6) AS bigram_surprisal_nats
    FROM pairs
    JOIN big USING (prev, cur)
    JOIN ctx USING (prev)
    JOIN uni USING (cur)
    CROSS JOIN tot
    GROUP BY doc_id
    """,
    tags=("text", "lm", "perplexity", "quality"),
    driver=False,  # rotation r7: driver-green r4-r6; family keeps other driver rows
)
def doc_bigram_surprisal(spark, sf_dir):
    """Interpolated bigram-LM cross-entropy per document (λ=0.8) — the
    context-sensitive perplexity quality filter
    (operators/textops.bigram_surprisal); LM tables are built in-engine
    as vocabulary-bounded aggregates and joined back by token keys."""
    d = load_table(spark, sf_dir, "documents")
    return textops.bigram_surprisal(d, "text", "doc_id", lam=0.8)


@register(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS token FROM documents),
    freq AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM freq)
    SELECT token, cnt, ROUND(cnt / n, 6) AS share
    FROM freq CROSS JOIN tot
    WHERE cnt / n >= 0.005
    """,
    tags=("text", "frequent-items", "heavy-hitters"),    driver=False,  # rotation r7: driver-green r5-r6; cms_token_counts + doc_surprisal keep the token-stats family
)
def heavy_hitter_tokens(spark, sf_dir):
    """Frequent-items gate: tokens holding ≥0.5% of the corpus token
    mass, with their share — the support-threshold face of the token
    frequency table (stopword discovery / boilerplate detection). One
    map-side-combined aggregate; the corpus total rides along as a
    broadcast single-row aggregate, so no second scan."""
    d = load_table(spark, sf_dir, "documents")
    freq = textops.token_frequencies(d).localCheckpoint(eager=False)
    total = freq.groupBy().agg(F.sum("cnt").cast("double").alias("_n"))
    return (
        freq.join(F.broadcast(total))
        .filter(F.col("cnt") / F.col("_n") >= 0.005)
        .select("token", "cnt", F.round(F.col("cnt") / F.col("_n"), 6).alias("share"))
    )


def _run_incremental_batches(spark, sf_dir, prefix, admit_fn, n_batches=3):
    """Shared scaffold of the incremental cross-snapshot dedup queries:
    split documents into ``n_batches`` by ``doc_id % n`` (batch order is
    NOT id order, so later batches genuinely collide with the store),
    feed each through ``admit_fn(batch_df, store_path)`` in sequence,
    and return the union of the admitted rows. The store is private per
    invocation (plans/workdirs.py — concurrent runs must not share a
    store mid-evolution)."""
    from .workdirs import fresh_result_dir

    store = fresh_result_dir(prefix)
    d = load_table(spark, sf_dir, "documents")
    # per-batch stores are tiny; a session-sized shuffle count (32/200)
    # makes every store join/aggregate pay empty-partition overhead —
    # pin small while the batches run (same rationale as the streaming
    # maintenance scaffold). The admitted frames are localCheckpointed
    # inside the operators, so restoring afterwards is safe.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        parts = []
        for b in range(n_batches):
            batch = d.filter(F.pmod(F.col("doc_id"), F.lit(n_batches)) == b)
            parts.append(admit_fn(batch, store))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "incremental_content_dedup_docs",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text, lang, source, n_chars,
             doc_id % 3 AS bid, md5({_NORM}) AS fp
      FROM documents
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY bid, doc_id) AS rn
      FROM f
    )
    SELECT doc_id, text, lang, source, n_chars FROM r WHERE rn = 1
    """,
    tags=("dedup", "incremental", "maintenance", "cross-snapshot"),
    # rotation r12: driver-green r5-r11 (7 straight); the dedup family
    # keeps incremental_near_dup + intra_doc + duplicate_passages rows
    driver=False,
)
def incremental_content_dedup_docs(spark, sf_dir):
    """CROSS-SNAPSHOT exact dedup, oracle-checked end to end: the
    corpus arrives as THREE batches (``doc_id % 3`` — batch order is
    not id order, so later batches genuinely collide with the store),
    each filtered against the fingerprint store of everything admitted
    so far (operators/dedup.incremental_content_dedup — the
    daily-crawl-lands-on-an-existing-corpus shape; the store holds
    16-byte digests, never text). A document survives iff no
    earlier-batch document — or same-batch document with a smaller
    id — shares its content fingerprint, which is exactly the
    row_number-over-(batch, id) oracle. Store cost at 100 TB is ~0.02%
    of corpus; each batch's check is one digest anti-join."""
    return _run_incremental_batches(
        spark, sf_dir, "inc_dedup",
        lambda batch, store, _n=iter(range(3)): dedup.incremental_content_dedup(
            spark, batch, store, writer_id="nightly", batch_id=next(_n)
        ),
    )


# Per-batch building blocks of the incremental near-dup oracle (bands /
# shingle digests shared with the near_dup_filter oracle prelude).
# LSH CTEs shared by the incremental near-dup oracle AND the composed
# incremental pipeline oracle (pipelineplans) — everything except the
# `batched` membership CTE, which each consumer defines itself.
_INC_LSH_CTES = f"""
    sh AS MATERIALIZED (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents WHERE len({_TOKS}) > 0
    ),
    dg AS MATERIALIZED (SELECT doc_id, md5('0:' || sh) AS d0, md5('1:' || sh) AS d1 FROM sh),
    sig AS MATERIALIZED (
      SELECT doc_id, s.seed,
             MIN(substr(CASE WHEN s.seed < 4 THEN d0 ELSE d1 END,
                        CAST((s.seed % 4) * 8 + 1 AS INTEGER), 8)) AS mh
      FROM dg CROSS JOIN (SELECT unnest(range(8)) AS seed) s
      GROUP BY doc_id, s.seed
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, CAST(seed // 2 AS INTEGER) AS band,
             md5(CAST(seed // 2 AS VARCHAR) || '|' || string_agg(mh, '|' ORDER BY seed)) AS band_key
      FROM sig GROUP BY doc_id, seed // 2
    ),
    shd AS MATERIALIZED (SELECT DISTINCT doc_id, md5(sh) AS s FROM sh),
    sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id)
"""

_INC_PRELUDE = _INC_LSH_CTES + """,
    batched AS MATERIALIZED (SELECT doc_id, doc_id % 3 AS bid FROM documents)
"""


def _inc_batch_sql(b: int, admitted_union: str | None) -> str:
    """The CTE block for batch ``b``: cross-match against the admitted
    set (None for the bootstrap batch), then in-batch LSH → Jaccard →
    components → min-id representative."""
    if admitted_union is None:
        live = f"live{b} AS MATERIALIZED (SELECT doc_id FROM batched WHERE bid = {b})"
    else:
        live = f"""
    cross{b} AS MATERIALIZED (
      SELECT DISTINCT nb.doc_id AS nid, ob.doc_id AS oid
      FROM bands nb
      JOIN batched dn ON dn.doc_id = nb.doc_id AND dn.bid = {b}
      JOIN bands ob ON ob.band_key = nb.band_key
      JOIN ({admitted_union}) adm ON adm.doc_id = ob.doc_id
    ),
    xver{b} AS MATERIALIZED (
      SELECT DISTINCT i.nid AS doc_id FROM (
        SELECT c.nid, c.oid, COUNT(*) AS ninter
        FROM cross{b} c
        JOIN shd na ON na.doc_id = c.nid
        JOIN shd ob ON ob.doc_id = c.oid AND ob.s = na.s
        GROUP BY c.nid, c.oid
      ) i
      JOIN sizes sa ON sa.doc_id = i.nid
      JOIN sizes sb ON sb.doc_id = i.oid
      WHERE CAST(i.ninter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.ninter) >= 0.8
    ),
    live{b} AS MATERIALIZED (
      SELECT doc_id FROM batched WHERE bid = {b}
        AND doc_id NOT IN (SELECT doc_id FROM xver{b})
    )"""
    return f"""{live},
    cand{b} AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN live{b} la ON la.doc_id = a.doc_id
      JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
      JOIN live{b} lb ON lb.doc_id = b.doc_id
    ),
    ver{b} AS MATERIALIZED (
      SELECT i.id_a, i.id_b FROM (
        SELECT c.id_a, c.id_b, COUNT(*) AS ninter
        FROM cand{b} c
        JOIN shd a ON a.doc_id = c.id_a
        JOIN shd b ON b.doc_id = c.id_b AND b.s = a.s
        GROUP BY c.id_a, c.id_b
      ) i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE CAST(i.ninter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.ninter) >= 0.8
    ),
    edges{b} AS (
      SELECT id_a AS s, id_b AS t FROM ver{b} UNION SELECT id_b, id_a FROM ver{b}
    ),
    reach{b}(node, lab) AS (
      SELECT s, s FROM edges{b}
      UNION
      SELECT e.s, r.lab FROM edges{b} e JOIN reach{b} r ON e.t = r.node
    ),
    comp{b} AS MATERIALIZED (SELECT node, MIN(lab) AS lab FROM reach{b} GROUP BY node),
    adm{b} AS MATERIALIZED (
      SELECT doc_id FROM live{b}
      WHERE doc_id NOT IN (SELECT node FROM comp{b} WHERE lab < node)
    )"""


_INC_NEAR_DUP_ORACLE = (
    "WITH RECURSIVE "
    + _INC_PRELUDE
    + ","
    + _inc_batch_sql(0, None)
    + ","
    + _inc_batch_sql(1, "SELECT doc_id FROM adm0")
    + ","
    + _inc_batch_sql(2, "SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1")
    + """
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN (SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1
          UNION ALL SELECT doc_id FROM adm2) a ON a.doc_id = d.doc_id
    """
)


@register(
    "incremental_near_dup_docs",
    oracle=_INC_NEAR_DUP_ORACLE,
    tags=("dedup", "incremental", "minhash", "lsh", "maintenance", "cross-snapshot"),
)
def incremental_near_dup_docs(spark, sf_dir):
    """CROSS-SNAPSHOT near-dup dedup, oracle-checked end to end: the
    corpus arrives as THREE batches (``doc_id % 3``); each batch is
    admitted only if not a near-duplicate (MinHash-LSH candidates →
    exact Jaccard ≥ 0.8) of anything ALREADY ADMITTED, then collapsed
    in-batch (components → min-id representative) and its digests
    appended to the store (operators/dedup.incremental_near_dup — the
    store holds band keys + shingle digests + sizes, never text). The
    oracle replays the full three-batch evolution in SQL — per batch: a
    cross-match against the admitted union, the in-batch LSH/Jaccard
    pipeline, and a recursive-CTE component collapse — so the
    differential checks the admitted-set EVOLUTION, not one pass.
    Deliberate semantics (docstring of the operator): a new doc is
    compared against admitted representatives only, so the incremental
    result can admit docs a one-shot global pass would drop via
    transitive closure — which is why this query's oracle is NOT
    near_dup_filter's."""
    return _run_incremental_batches(
        spark, sf_dir, "inc_near_dup",
        # max_bucket_size=64 wires the store-join fan-in guard
        # (operators/dedup.store_cross_candidates): the ONE cost term
        # that grows with the admitted store is per-band-bucket
        # membership, and the cap bounds it. 64 is >5× the densest
        # band bucket either fixture produces (measured max 12 at
        # sf0.1, 3 at sf0.01), so the cap cannot trigger here and the
        # oracle is unaffected — it exists to bound degenerate
        # boilerplate keys at corpus scale (adversarial-store bound
        # pinned in tests/test_dedup.py).
        # fenced nightly appends (r15): the three digest tables are
        # snapshot tables with sizes as the commit point — the driver
        # face exercises the exactly-once path, not just the operator
        lambda batch, store, _n=iter(range(3)): dedup.incremental_near_dup(
            spark, batch, store, num_hashes=8, bands=4, max_bucket_size=64,
            writer_id="nightly", batch_id=next(_n),
        ),
    )


@register(
    "cms_token_counts_docs",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    ex AS MATERIALIZED (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    probes AS MATERIALIZED (SELECT tok, n FROM ex ORDER BY n DESC, tok LIMIT 20),
    hrows AS (SELECT unnest(range(4)) AS hrow),
    cms AS MATERIALIZED (
      SELECT hrow,
             ('0x' || substr(md5(CAST(hrow AS VARCHAR) || ':' || tok), 1, 8))::BIGINT % 1024 AS bucket,
             COUNT(*) AS n
      FROM toks CROSS JOIN hrows GROUP BY 1, 2
    ),
    pb AS (
      SELECT p.tok, p.n AS exact_count, r.hrow,
             ('0x' || substr(md5(CAST(r.hrow AS VARCHAR) || ':' || p.tok), 1, 8))::BIGINT % 1024 AS bucket
      FROM probes p CROSS JOIN hrows r
    )
    SELECT pb.tok AS token,
           CAST(MIN(pb.exact_count) AS BIGINT) AS exact_count,
           CAST(MIN(COALESCE(c.n, 0)) AS BIGINT) AS cms_count
    FROM pb LEFT JOIN cms c ON c.hrow = pb.hrow AND c.bucket = pb.bucket
    GROUP BY pb.tok
    """,
    tags=("sketch", "count-min", "heavy-hitters", "approx"),
    # rotation r12: driver-green r6-r11 (6 straight); the sketch family
    # keeps linear_count + kmv + the three stream maintenance rows
    driver=False,
)
def cms_token_counts_docs(spark, sf_dir):
    """Count-min sketch point estimates vs exact counts for the
    corpus's top-20 tokens (operators/sketches.cms_table /
    cms_estimates, depth 4 × width 1024). Every counter derives from
    md5 — deterministic and engine-portable — so unlike the HLL/KLL
    family this sketch has a FULL value-level oracle: DuckDB rebuilds
    the identical d×w counter table and reads the identical minima.
    The count-min guarantee (estimate ≥ exact; ≤ exact + εN w.h.p.) is
    additionally pinned as an invariant in tests/test_approx.py. At
    100 TB the sketch is still depth×width counters — kilobytes — and
    counters merge by addition, so partials roll up across partitions
    and snapshots like the OHLC/HLL stores."""
    from ..functions import text as textfn
    from ..operators import sketches

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(textfn.tokens("text")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    probes = exact.orderBy(F.col("exact_count").desc(), F.col("tok")).limit(20)
    cms = sketches.cms_table(toks, "tok", depth=4, width=1024)
    est = sketches.cms_estimates(cms, probes.select("tok"), "tok", depth=4, width=1024)
    return (
        probes.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            F.col("exact_count").cast("long").alias("exact_count"),
            F.col("cms_count").cast("long").alias("cms_count"),
        )
    )


@register(
    "duplicate_passages_docs",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, unnest({_TOKS}) AS tok, generate_subscripts({_TOKS}, 1) AS pos
      FROM documents
    ),
    g AS MATERIALIZED (
      SELECT doc_id, pos,
             CASE WHEN COUNT(*) OVER w8 = 8
                  THEN md5(string_agg(tok, ' ') OVER w8) END AS g
      FROM t
      WINDOW w8 AS (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
    ),
    dup AS MATERIALIZED (
      SELECT g FROM g WHERE g IS NOT NULL
      GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    f AS MATERIALIZED (
      SELECT g.doc_id, g.pos,
             CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END AS dup_start
      FROM g LEFT JOIN dup d ON d.g = g.g
    ),
    cov AS MATERIALIZED (
      SELECT doc_id, pos,
             MAX(dup_start) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) = 1 AS cov
      FROM f
    ),
    c AS MATERIALIZED (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM cov WHERE cov
    ),
    sp AS (SELECT doc_id, isl, COUNT(*) AS span_len FROM c GROUP BY doc_id, isl),
    agg AS (
      SELECT doc_id,
             CAST(SUM(span_len) AS BIGINT) AS dup_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(MAX(span_len) AS BIGINT) AS max_span_len
      FROM sp GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           COALESCE(a.dup_tokens, 0) AS dup_tokens,
           COALESCE(a.n_spans, 0) AS n_spans,
           COALESCE(a.max_span_len, 0) AS max_span_len,
           CASE WHEN len({_TOKS}) > 0
                THEN CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE) / len({_TOKS})
                ELSE 0.0 END AS dup_fraction
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
    tags=("dedup", "substring", "passages", "training-data"),
)
def duplicate_passages_docs(spark, sf_dir):
    """CROSS-doc duplicated-passage stats — the exact-substring dedup
    family (Lee et al. 2022) the near-dup/intra-doc operators don't
    cover: for each document, the maximal token spans whose 8-gram
    content appears verbatim in at least one OTHER document
    (operators/textops.duplicate_passages), aggregated to per-doc
    duplicated-token counts, span counts, and duplicated fraction —
    the quantity pipelines threshold on to drop or trim
    boilerplate-heavy documents. Every doc comes back (zero rows for
    clean docs); the oracle replays the full positional definition —
    gram windows, cross-doc min/max distinctness, coverage, islands —
    in SQL."""
    d = load_table(spark, sf_dir, "documents")
    spans = textops.duplicate_passages(d, "text", "doc_id", n=8)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_len").cast("long").alias("dup_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.max("span_len").cast("long").alias("max_span_len"),
    )
    from ..functions import text as textfn

    counts = d.select(
        "doc_id", F.size(textfn.tokens("text")).cast("long").alias("n_tokens")
    )
    return counts.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("max_span_len", F.lit(0)).cast("long").alias("max_span_len"),
        F.when(
            F.col("n_tokens") > 0,
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )


@register(
    "bm25_batch_retrieval_docs",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    dl AS (SELECT doc_id, len({_TOKS}) AS dl FROM documents),
    post AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    ca AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    dft AS (SELECT token, COUNT(*) AS df_t FROM post GROUP BY token),
    q AS (
      SELECT DISTINCT doc_id AS qid, token FROM toks
      WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ''), 1, 8))::BIGINT % 100) < 2
    ),
    qf AS (
      SELECT q.qid, q.token, dft.df_t FROM q
      JOIN dft USING (token)
    ),
    sc AS (
      SELECT qf.qid, p.doc_id,
             SUM(ln(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
                 * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))) AS s
      FROM qf
      JOIN post p USING (token)
      JOIN dl ON dl.doc_id = p.doc_id
      CROSS JOIN ca
      GROUP BY qf.qid, p.doc_id
    ),
    r AS (
      SELECT qid, doc_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, doc_id) AS rank, s
      FROM sc
    )
    SELECT qid, doc_id, CAST(rank AS INTEGER) AS rank, ROUND(s, 6) AS bm25
    FROM r WHERE rank <= 3
    """,
    tags=("text", "bm25", "retrieval", "ranking", "batch", "rag"),
    driver=False,  # extended tier: evidence via the full-suite sweep
)
def bm25_batch_retrieval_docs(spark, sf_dir):
    """BATCH BM25 RETRIEVAL (operators/textops.bm25_batch_retrieval,
    r13): the hash-held-out 2% of docs act as N simultaneous queries;
    for each, the top-3 corpus docs by BM25 via ONE inverted-index
    equi-join (query side broadcast) —
    the RAG-training / hard-negative retrieval shape, vs
    `bm25_topk_docs`' single ad-hoc term bag. (On this synthetic
    corpus self-retrieval is NOT top-1 — the 31-token shared
    vocabulary makes BM25 favor short docs over exact self-matches;
    the oracle re-derives the same ranking, which is the point.)"""
    d = load_table(spark, sf_dir, "documents")
    from ..operators import sampling

    queries = d.filter(sampling.hash_bucket("doc_id", 100) < 2).select(
        F.col("doc_id").alias("qid"), "text"
    )
    # the synthetic corpus has a 31-token vocabulary with ~80% document
    # frequency, so ANY df cut degenerates to an empty term set here —
    # the stop-posting optimization (operator default max_df_ratio=0.5)
    # is exercised on constructed fixtures in tests/test_round4_ops.py
    return textops.bm25_batch_retrieval(d, queries, k=3, max_df_ratio=1.0)


@register(
    "leakage_safe_split_docs",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS sh FROM documents WHERE len({_TOKS}) > 0
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
    edges AS (
      SELECT id_a AS s, id_b AS t FROM ver UNION SELECT id_b, id_a FROM ver
    ),
    reach(node, lab) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lab FROM edges e JOIN reach r ON e.t = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS lab FROM reach GROUP BY node)
    SELECT doc_id,
           COALESCE(comp.lab, doc_id) AS cluster_id,
           CASE WHEN (('0x' || substr(md5(CAST(COALESCE(comp.lab, doc_id) AS VARCHAR) || ''), 1, 8))::BIGINT % 100) < 10
                THEN 'eval' ELSE 'train' END AS split
    FROM documents LEFT JOIN comp ON comp.node = doc_id
    """,
    tags=("sampling", "split", "dedup", "leakage", "components"),
    driver=False,  # extended tier: evidence via the full-suite sweep
)
def leakage_safe_split_docs(spark, sf_dir):
    """LEAKAGE-SAFE train/eval split (operators/dedup.
    leakage_safe_split, r13): the split decision hashes the near-dup
    CLUSTER representative, not the doc id, so no near-duplicate pair
    can straddle the train/eval boundary — the structural fix for the
    benchmark-contamination mode a plain id-hash split creates (twins
    of eval docs training). The oracle replays the full LSH → Jaccard
    ≥ 0.8 → components chain and the rep-hash decision; the planted
    near-dup pairs in the corpus land pairwise on one side (their
    shared cluster_id makes that visible in the result)."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.leakage_safe_split(d, "text", "doc_id", eval_pct=10).select(
        "doc_id", "cluster_id", "split"
    )
