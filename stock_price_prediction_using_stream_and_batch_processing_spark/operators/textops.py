"""Document-table text analysis operators (north-star surface):
language ID, quality scoring, token counting, fingerprinting. Thin
DataFrame wrappers over functions/text.py column expressions — all
JVM-side, fully pushdown/pruning-friendly."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing, text


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per doc with the full text-quality feature set.

    One-pass shape: the normalize regex runs ONCE per row (stage 1),
    tokens are split from it once (stage 2), and every ratio/score is
    arithmetic over those materialized columns (stage 3). Catalyst's
    CollapseProject keeps the staging because the intermediates are
    non-cheap and multiply referenced — previously quality_score
    re-derived the whole regex tree per term (~5× regex per row)."""
    norm = df.select(
        "doc_id",
        text.normalize(text_col).alias("_norm"),
        text.punct_ratio(text_col).alias("_punct"),
        text.bpe_ish_token_count(text_col).alias("n_subword_tokens"),
        text.char_count(text_col).alias("n_chars_actual"),
    )
    toksed = norm.select(
        "doc_id",
        text.tokens_from_normalized(F.col("_norm")).alias("_toks"),
        F.md5("_norm").alias("fingerprint"),  # == hashing.fingerprint(text)
        "_punct",
        "n_subword_tokens",
        "n_chars_actual",
    )
    sized = toksed.select(
        "doc_id",
        F.size("_toks").alias("_n"),
        text.stopword_ratio_from_tokens(F.col("_toks")).alias("_sw"),
        "_punct",
        "n_subword_tokens",
        "n_chars_actual",
        "fingerprint",
    )
    return sized.select(
        "doc_id",
        F.col("_n").alias("n_tokens"),
        "n_subword_tokens",
        "n_chars_actual",
        F.round("_punct", 6).alias("punct_ratio"),
        F.round("_sw", 6).alias("stopword_ratio"),
        F.round(
            text.quality_score_from(F.col("_n").cast("double"), F.col("_punct"), F.col("_sw")), 6
        ).alias("quality"),
        text.lang_id_from(F.col("_n"), F.col("_sw")).alias("lang_pred"),
        "fingerprint",
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """punct/stopword ratios + composite quality, one regex pass per row
    (the hot-path subset of :func:`text_profile`)."""
    base = df.select(
        F.col(id_col),
        text.tokens(text_col).alias("_toks"),
        text.punct_ratio(text_col).alias("_punct"),
    )
    sized = base.select(
        id_col,
        F.size("_toks").alias("_n"),
        text.stopword_ratio_from_tokens(F.col("_toks")).alias("_sw"),
        "_punct",
    )
    return sized.select(
        id_col,
        F.round("_punct", 6).alias("punct_ratio"),
        F.round("_sw", 6).alias("stopword_ratio"),
        F.round(
            text.quality_score_from(F.col("_n").cast("double"), F.col("_punct"), F.col("_sw")), 6
        ).alias("quality"),
    )


def token_frequencies(df: DataFrame, text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Corpus token frequency table — explode + count (one shuffle with
    map-side combine; at scale this is the canonical word-count plan)."""
    toks = df.select(F.explode(text.tokens(text_col)).alias("token"))
    out = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    return out.filter(F.col("cnt") >= min_count)


def winnowed_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: hash every char ``k``-gram
    of the normalized text, slide a ``window``-position window, keep the
    min hash of each window, emit the DISTINCT selected hashes per doc.
    Guarantees any match of length >= k+window-1 shares a fingerprint —
    the local-similarity detector exact md5 fingerprints can't provide
    (Schleimer et al.'s MOSS algorithm).

    Plan: per-row k-gram array (positions via sequence; the lambda only
    touches a plain column attribute, so no per-element re-evaluation of
    the normalize tree) -> posexplode -> per-doc ordered window min ->
    distinct. One shuffle keyed by doc."""
    from pyspark.sql import Window as W

    norm = text.normalize(text_col)
    # admission matches the selection gate below: a doc needs at least
    # ONE full window (>= window k-gram positions, i.e. length >=
    # k+window-1) to emit any fingerprint — admitting shorter docs (the
    # old `>= k` filter) just silently produced zero rows for them.
    # Winnowing's guarantee starts at match length k+window-1 anyway;
    # shorter docs belong to exact/content dedup.
    d = df.select(F.col(id_col), norm.alias("_norm")).filter(
        F.length("_norm") >= k + window - 1
    )
    grams = d.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("_norm") - k + 1),
                lambda i: F.col("_norm").substr(i, F.lit(k)),
            )
        ).alias("pos", "gram"),
    )
    hashed = grams.select(id_col, "pos", hashing.hex32_to_long(F.md5("gram")).alias("h"))
    w = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    # only full windows select a fingerprint (last window-1 positions are
    # covered by earlier windows)
    n_pos = W.partitionBy(id_col)
    win_min = hashed.withColumn("_n", F.max("pos").over(n_pos)).filter(
        F.col("pos") <= F.col("_n") - window + 1
    ).withColumn("fp", F.min("h").over(w))
    return win_min.select(id_col, "fp").distinct()


def term_frequencies(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, token) term counts — explode + one (id, token)-keyed
    aggregation with map-side combine. The shuffle carries (id, token,
    partial-count) rows, never document text."""
    toks = df.select(F.col(id_col), F.explode(text.tokens(text_col)).alias("token"))
    return toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))


def repetition_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition signals (the Gopher/RefinedWeb-style
    quality filters that catch boilerplate and degenerate generations):

    - ``dup_token_frac``: 1 − distinct/total tokens
    - ``top_token_frac``: occurrences of the most frequent token / total
    - ``dup_bigram_frac``: 1 − distinct/total word bigrams

    Plan: token/bigram distinct counts are higher-order array ops in one
    projection (no shuffle); the most-frequent-token count needs real
    grouping, so it rides the (id, token) term-frequency aggregation and
    joins back by id. Both sides shuffle by doc id — two narrow
    shuffles carrying counts, never text."""
    tf = term_frequencies(df, text_col, id_col)
    top = tf.groupBy(id_col).agg(
        F.max("tf").alias("_top"), F.sum("tf").alias("_total"), F.count("*").alias("_distinct")
    )
    bigrams = df.select(
        F.col(id_col),
        text.token_count(text_col).alias("_n"),
        F.size(text.word_shingles(text_col, 2)).alias("_bg_distinct"),
    )
    j = bigrams.join(top, id_col, "left")
    total = F.col("_total")
    return j.select(
        id_col,
        F.round(
            F.when(total > 0, F.lit(1.0) - F.col("_distinct") / total).otherwise(F.lit(0.0)), 6
        ).alias("dup_token_frac"),
        F.round(
            F.when(total > 0, F.col("_top") / total).otherwise(F.lit(0.0)), 6
        ).alias("top_token_frac"),
        F.round(
            F.when(
                F.col("_n") >= 2, F.lit(1.0) - F.col("_bg_distinct") / (F.col("_n") - 1)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
    )


def tf_idf(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """TF-IDF weights per (doc, token): tf · (ln((1+N)/(1+df)) + 1)
    (the smoothed-idf form, so corpus-universal tokens still get weight
    1·tf and nothing divides by zero).

    Plan at scale: the term-frequency table keys one shuffle by
    (id, token) and is MATERIALIZED once (lazy localCheckpoint) —
    document frequency is a second aggregation of THAT table keyed by
    token, and without the cut Catalyst duplicates the whole
    tokenize+explode+aggregate subtree into the join's other side
    (a second full corpus scan; same union-branch non-sharing as
    windows.ohlc_rollup_levels). The corpus size N joins in as a
    broadcast single-row aggregate over a metadata-only scan, never a
    driver-side ``count()``. All arithmetic is exact given integer
    tf/df/N, so the cross-engine differential is stable."""
    tf = term_frequencies(df, text_col, id_col).localCheckpoint(eager=False)
    n_docs = df.groupBy().agg(F.count("*").alias("_n_docs"))
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    joined = tf.join(df_t, "token").join(F.broadcast(n_docs))
    idf = F.log((F.lit(1.0) + F.col("_n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    return joined.select(
        F.col(id_col),
        "token",
        "tf",
        F.round(idf, 6).alias("idf"),
        F.round(F.col("tf") * idf, 6).alias("tf_idf"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms:
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape: the token array is FILTERED to query terms with a
    higher-order function *before* the explode, so the exploded/
    shuffled row count is O(query hits), not O(corpus tokens); document
    length and the corpus aggregates (N, avgdl) come from the same
    single pass over the token arrays; per-term document frequencies
    (|query| rows) and the corpus aggregate (1 row) are broadcast.
    With ``top_k`` the final order-by folds to TakeOrderedAndProject —
    no global sort."""
    q = F.array(*[F.lit(t) for t in query_terms])
    # dl is the ONE corpus pass (id, length, query-term hits — small);
    # materialize it so the corpus aggregate, tf, and df_t all derive
    # from it instead of each re-running the tokenize scan
    dl = df.select(F.col(id_col), text.tokens(text_col).alias("_toks")).select(
        id_col,
        F.size("_toks").alias("dl"),
        F.filter("_toks", lambda t: F.array_contains(q, t)).alias("_hits"),
    ).localCheckpoint(eager=False)
    corpus = dl.groupBy().agg(F.count("*").alias("_n"), F.avg("dl").alias("_avgdl"))
    tf = (
        dl.select(id_col, "dl", F.explode("_hits").alias("token"))
        .groupBy(id_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count("*").alias("df_t"))
    j = tf.join(F.broadcast(dft), "token").join(F.broadcast(corpus))
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    gain = F.col("tf") * (k1 + 1.0)
    norm = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    scores = j.groupBy(id_col).agg(F.round(F.sum(idf * gain / norm), 6).alias("bm25"))
    if top_k is not None:
        scores = scores.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(top_k)
    return scores


def bm25_batch_retrieval(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "qid",
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """BATCH BM25 retrieval: for EVERY query document, the top-``k``
    corpus documents by BM25 — the retrieval shape a RAG-training /
    hard-negative-mining pipeline runs (N queries at once, not one
    ad-hoc term bag like :func:`bm25_scores`).

    Plan shape: the corpus postings index (doc, token, tf) and the
    per-doc lengths build in ONE tokenize pass (the inherent index
    cost, map-side combined); the query side reduces to DISTINCT
    (qid, token) pairs — held-out query sets are small, so they
    BROADCAST and the inverted-index equi-join touches each query
    term's posting list only, never the full corpus token stream.
    Query terms whose document frequency exceeds ``max_df_ratio``·N
    are dropped on the QUERY side (the standard stop-posting cut:
    their idf is ~0 while their posting lists are the corpus's
    longest — at 100 TB this bounds the join at O(informative-term
    postings) instead of O(corpus tokens)). Top-k per query is one
    window over the per-query score groups; ties break by doc id so
    ranks are deterministic across engines.
    """
    toks = corpus.select(
        F.col(id_col), text.tokens(text_col).alias("_toks")
    ).localCheckpoint(eager=False)
    dl = toks.select(id_col, F.size("_toks").alias("dl"))
    post = (
        toks.select(id_col, F.explode("_toks").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ca = dl.groupBy().agg(F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl"))
    dft = post.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    qterms = (
        queries.select(F.col(qid_col), F.explode(text.tokens(text_col)).alias("token"))
        .distinct()
        .join(dft, "token")
        .join(F.broadcast(ca))
        .where(F.col("df_t") <= F.lit(max_df_ratio) * F.col("_n"))
        .select(qid_col, "token", "df_t")
    )
    j = (
        post.join(F.broadcast(qterms), "token")
        .join(dl, id_col)
        .join(F.broadcast(ca))
    )
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    gain = F.col("tf") * (k1 + 1.0)
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    sc = j.groupBy(qid_col, id_col).agg(F.sum(idf * gain / norm).alias("_s"))
    w = Window.partitionBy(qid_col).orderBy(F.col("_s").desc(), F.col(id_col))
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            qid_col, id_col, F.col("rank").cast("int"),
            F.round("_s", 6).alias("bm25"),
        )
    )


def unigram_surprisal(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document cross-entropy (mean surprisal, nats) under the
    corpus's own unigram language model — the perplexity-style quality
    filter (CCNet-shape): documents whose tokens are improbable under
    the corpus distribution score high and get routed/filtered. A
    production pipeline swaps in an external KenLM; the plumbing — LM
    table join + per-doc aggregation — is identical.

    Plan: token frequencies aggregate once (map-side combined); the
    doc-token stream joins the frequency table by token (AQE broadcasts
    it while the vocabulary is small; shuffles by token beyond that)
    and the corpus total rides along as a broadcast single-row
    aggregate. Only the final per-doc mean is order-dependent float
    math, rounded for the differential."""
    toks = df.select(F.col(id_col), F.explode(text.tokens(text_col)).alias("token"))
    # freq is vocabulary-sized — materialize it once so the corpus
    # total and the LM join both read it instead of each embedding
    # another full tokenize scan (3 corpus scans -> 1 + the join's)
    freq = toks.groupBy("token").agg(F.count("*").alias("cnt")).localCheckpoint(eager=False)
    total = freq.groupBy().agg(F.sum("cnt").alias("_total"))
    joined = toks.join(freq, "token").join(F.broadcast(total))
    logp = F.log(F.col("cnt") / F.col("_total"))
    return joined.groupBy(id_col).agg(F.round(-F.avg(logp), 6).alias("surprisal_nats"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    RAG / pretraining document splitter. With stride = chunk_tokens −
    overlap, chunk i covers tokens [i·stride, i·stride + chunk_tokens);
    every token position belongs to ≥1 chunk, consecutive chunks share
    ``overlap`` tokens, and the final chunk may be short. Empty docs
    yield no chunks.

    Plan: tokens materialize once per row, chunk starts are a
    ``sequence`` array, and each chunk is a ``slice`` + ``array_join``
    inside a ``transform`` whose lambda touches only plain column
    attributes (no per-element re-evaluation of the tokenize tree) —
    then one ``posexplode``. Chunking is embarrassingly parallel: no
    shuffle at all; output order/row-multiplicity is per input row."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    base = df.select(F.col(id_col), text.tokens(text_col).alias("_toks"))
    n = F.size("_toks")
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(F.col("_toks"), s + 1, chunk_tokens), " ").alias("txt"),
            F.size(F.slice(F.col("_toks"), s + 1, chunk_tokens)).alias("nt"),
        ),
    )
    return base.select(id_col, F.posexplode(chunks).alias("chunk_id", "_c")).select(
        id_col,
        "chunk_id",
        F.col("_c.txt").alias("chunk_text"),
        F.col("_c.nt").alias("n_chunk_tokens"),
    )


# PII patterns shared with the DuckDB oracle — RE2-safe (no lookaround),
# identical semantics under Java regex and DuckDB/RE2.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scrub emails / phone numbers / IPv4s from the text column,
    replacing each match with a typed placeholder ([EMAIL], ...), and
    count the redactions per type. One projection, all JVM-side regex —
    the standard pre-training privacy scrub. (A production pipeline
    swaps in NER-model patterns; the plumbing — ordered regex cascade +
    per-type counts in a single pass — is what this operator is.)"""
    redacted = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name.lower()}"))
        redacted = F.regexp_replace(redacted, pat, f"[{name}]")
    return df.select(F.col(id_col), redacted.alias("text_redacted"), *counts)


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.8,
) -> DataFrame:
    """Per-document cross-entropy (mean surprisal, nats) under an
    interpolated bigram language model trained on the corpus itself:
    P(w_i | w_{i-1}) = λ·c(w_{i-1} w_i)/c(w_{i-1}·) + (1-λ)·c(w_i)/N.
    The context-sensitive upgrade of :func:`unigram_surprisal` — fluent
    but rare-word text stops being penalized, shuffled/boilerplate text
    stands out — the KenLM-style quality filter with the LM tables
    built in-engine.

    Plan: tokens materialize once per doc; the bigram stream explodes
    from the token ARRAY COLUMN (a column reference, so the tokenizer
    regex runs once per row, not per element); bigram counts,
    context totals, and unigram counts are three map-side-combined
    aggregates of vocabulary-bounded size; the per-doc stream joins
    them by token keys (AQE broadcasts while the vocab is small) and
    one per-doc mean closes it. λ-interpolation means unseen bigrams
    of seen words still score finitely; every bigram in scope appears
    in the tables by construction (same-corpus training)."""
    toks = df.select(F.col(id_col), text.tokens(text_col).alias("_t"))
    idx = F.sequence(F.lit(1), F.size("_t") - 1)
    pair = F.transform(
        idx,
        lambda i: F.struct(
            F.try_element_at(F.col("_t"), i).alias("prev"),
            F.try_element_at(F.col("_t"), i + 1).alias("cur"),
        ),
    )
    pairs = (
        toks.filter(F.size("_t") >= 2)
        .select(F.col(id_col), F.explode(pair).alias("_bg"))
        .select(F.col(id_col), F.col("_bg.prev").alias("prev"), F.col("_bg.cur").alias("cur"))
    )
    # vocabulary-sized LM tables, each one aggregate
    big = pairs.groupBy("prev", "cur").agg(F.count("*").alias("c2")).localCheckpoint(eager=False)
    ctx = big.groupBy("prev").agg(F.sum("c2").alias("c_ctx"))
    unis = toks.select(F.explode("_t").alias("cur"))
    uni = unis.groupBy("cur").agg(F.count("*").alias("c1")).localCheckpoint(eager=False)
    total = uni.groupBy().agg(F.sum("c1").cast("double").alias("_n"))
    joined = (
        pairs.join(big, ["prev", "cur"])
        .join(ctx, "prev")
        .join(uni, "cur")
        .join(F.broadcast(total))
    )
    p = F.lit(lam) * F.col("c2") / F.col("c_ctx") + F.lit(1.0 - lam) * F.col("c1") / F.col("_n")
    return joined.groupBy(id_col).agg(
        F.round(-F.avg(F.log(p)), 6).alias("bigram_surprisal_nats")
    )


def remove_repeated_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """INTRA-document n-gram dedup — the rewrite face of repetition
    filtering: every token covered by a word n-gram whose exact text
    occurred EARLIER in the same document is removed, and the cleaned
    (normalized-space) text is rebuilt. Corpus-level near-dup removal
    (near_dup_filter) drops whole documents; this operator drops the
    repeated SPANS inside a document (boilerplate refrains, stuttered
    generation, copy-pasted paragraphs) and keeps the rest — the
    standard intra-doc companion to cross-doc dedup in training-data
    pipelines (production uses larger n; the mechanics are identical).

    Definition (positional, engine-portable): gram g starts at token
    position p if tokens[p..p+n-1] joined by spaces equals g; a start
    is REPEATED if an earlier start of the same gram exists in the doc
    (min-pos over (doc, gram)); a token is removed iff some repeated
    start s covers it (s in [p-n+1, p] — one windowed max over a
    bounded frame). Output: (id, n_tokens, n_removed, clean_text) with
    clean_text in normalized space (the canonical dedup form).

    Scale shape: explode to (doc, pos, token) once, then three
    windows/aggregates over at most O(tokens) rows — keyed by doc,
    (doc, gram), doc — so the whole pipeline is a handful of linear
    shuffles; the first-occurrence pass is a window, not a self-join,
    so cost never goes O(tokens²), and no stage carries document
    text, only tokens."""
    if n < 2:
        raise ValueError("n must be >= 2")
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.posexplode(text.tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, n)]
    valid = leads[-1].isNotNull()
    gram = F.when(valid, F.concat_ws(" ", F.col("tok"), *leads))
    g = toks.select(id_col, "pos", "tok", gram.alias("gram"))
    first_pos = F.min("pos").over(Window.partitionBy(id_col, "gram"))
    rep = (F.col("gram").isNotNull() & (F.col("pos") > first_pos)).cast("int")
    r = g.select(id_col, "pos", "tok", rep.alias("rep"))
    covered = (
        F.max("rep").over(w.rowsBetween(-(n - 1), 0)) == 1
    )
    marked = r.select(id_col, "pos", "tok", covered.alias("removed"))
    kept_struct = F.when(~F.col("removed"), F.struct("pos", "tok"))
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("removed").cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda x: x["tok"]),
            " ",
        ).alias("clean_text"),
    )


def duplicate_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """CROSS-document duplicated-passage detection — the distributed
    analogue of suffix-array exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal token span that also appears verbatim in ANOTHER
    document. Near-dup (MinHash) drops whole similar documents;
    ``remove_repeated_ngrams`` handles repeats INSIDE one document;
    this operator surfaces the remaining class — verbatim passages
    SHARED across documents (boilerplate, license headers, quoted
    chunks) — which whole-doc similarity can miss entirely when the
    surrounding text differs.

    Definition (positional, engine-portable): a gram starts at token
    position p if the doc has ≥ n tokens from p; a start is duplicated
    iff the same n-token text occurs in ≥ 2 DISTINCT documents; a
    token is covered iff some duplicated start s ∈ [p-n+1, p] covers
    it; maximal spans are runs of consecutive covered positions
    (gaps-and-islands). Returns one row per span:
    ``(id_col, span_start, span_end, span_len)`` with 0-based token
    positions, end inclusive.

    Scale shape: the corpus-wide duplication test shuffles 16-byte
    gram DIGESTS, never text (the dedup-module rule), through ONE
    partial-aggregating groupBy — ``min(doc) != max(doc)`` is the
    exact ≥-2-distinct-docs test without a countDistinct. A window
    over the gram key would materialize one giant partition for every
    stop-word-ish gram; the groupBy combines map-side and AQE splits
    residual skew. Everything else is per-doc windows over (doc, pos)
    rows — a handful of linear shuffles keyed by doc, O(tokens) rows,
    no self-join, no document text in flight after tokenization."""
    if n < 2:
        raise ValueError("n must be >= 2")
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.posexplode(text.tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.lead("tok", i).over(w) for i in range(1, n)]
    gram = F.when(leads[-1].isNotNull(), F.md5(F.concat_ws(" ", F.col("tok"), *leads)))
    # the gram frame feeds BOTH the corpus-wide duplication aggregate
    # and the per-doc coverage join: localCheckpoint computes the
    # tokenize+lead pipeline once instead of per consumer (the shared
    # exploded_shingles discipline from operators/dedup.py)
    g = toks.select(id_col, "pos", gram.alias("g")).localCheckpoint(eager=False)
    dup = (
        g.where(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
        .where(F.col("_mn") != F.col("_mx"))
        .select("g", F.lit(1).alias("_dup"))
    )
    flagged = g.join(dup, "g", "left").select(
        id_col, "pos", F.coalesce("_dup", F.lit(0)).alias("dup_start")
    )
    covered = F.max("dup_start").over(w.rowsBetween(-(n - 1), 0)) == 1
    c = flagged.select(id_col, "pos", covered.alias("cov")).where("cov")
    return (
        c.select(id_col, "pos", (F.col("pos") - F.row_number().over(w)).alias("_isl"))
        .groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("pos").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("span_len"),
        )
        .drop("_isl")
    )
