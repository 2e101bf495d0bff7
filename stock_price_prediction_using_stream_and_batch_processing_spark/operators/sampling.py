"""Deterministic sampling, splitting, and sequence-packing operators —
the reproducibility-critical steps of a training-data pipeline.

Random sampling (``df.sample``) is NOT reproducible across runs,
partitionings, or engines; every operator here derives its decision
from a content hash of a stable id (md5, identical in Spark / DuckDB /
Python), so the same row lands in the same split/sample/bin on every
engine at every scale — and the whole thing is a narrow projection +
filter that Catalyst pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hex32_to_long, hex_prefix_to_long


def hash_bucket(id_col: Column | str, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable [0, n_buckets) bucket from md5 of the id (+ salt). The
    salt gives independent re-draws: sampling with salt 'a' is
    uncorrelated with salt 'b' — resample without touching the data."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hex32_to_long(F.md5(F.concat(c.cast("string"), F.lit(salt)))) % n_buckets


def hash_sample(df: DataFrame, id_col: str, pct: int, salt: str = "") -> DataFrame:
    """Keep a deterministic ~pct% of rows by id-hash bucket. A pure
    filter — no shuffle, prunes with the scan, and the SAME rows
    survive on any engine/partitioning (unlike df.sample)."""
    return df.filter(hash_bucket(id_col, 100, salt) < pct)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 90,
    val_pct: int = 5,
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign each row a stable train/val/test label by id-hash bucket.
    Rows never migrate between splits across runs or engines — the
    property that keeps eval sets uncontaminated as the corpus grows
    (new rows hash into splits at the same rates; old rows stay put)."""
    b = hash_bucket(id_col, 100, salt)
    label = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out, label)


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """Context-window packing: concatenate documents (in stable order)
    and chop into ``capacity``-token bins — each doc is assigned the
    bin where its first token lands (pretraining packing semantics:
    documents straddle bin boundaries).

    Scale shape: a GLOBAL running sum would serialize into one task,
    so docs are first sharded by id-hash (each shard packs
    independently — exactly how a distributed packing job fans out
    over workers) and the running sum is a window per shard:
    ``Window.partitionBy(shard)`` → one shuffle, B parallel external
    sorts, no global order anywhere. Deterministic: shard and order
    derive from the id hash/id, so the same doc lands in the same bin
    on every run and engine.
    """
    shard = hash_bucket(id_col, n_shards, salt)
    d = df.withColumn("_shard", shard)
    w = Window.partitionBy("_shard").orderBy(id_col)
    prev_cum = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (
        d.withColumn("bin_in_shard", F.floor(prev_cum / F.lit(float(capacity))).cast("long"))
        .withColumn(
            "bin_id",
            F.concat(F.col("_shard").cast("string"), F.lit(":"), F.col("bin_in_shard").cast("string")),
        )
        .withColumn("shard", F.col("_shard").cast("long"))
        .drop("_shard")
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep ~``rates[stratum]``% of
    each stratum's rows by id hash (strata not in ``rates`` keep
    ``default_pct``%). The corpus-mixture re-balancing step of a
    training pipeline (e.g. downsample the dominant language, keep all
    of a low-resource one) — reproducible, unlike ``df.sampleBy``, and
    still a pure filter: no shuffle, prunes with the scan."""
    pct = None
    for k, v in rates.items():
        cond = F.col(strata_col) == k
        pct = F.when(cond, F.lit(v)) if pct is None else pct.when(cond, F.lit(v))
    pct = F.lit(default_pct) if pct is None else pct.otherwise(F.lit(default_pct))
    return df.filter(hash_bucket(id_col, 100, salt) < pct)


def mixture_resample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    targets: dict[str, float],
    salt: str = "",
    resolution: int = 1_000_000,
) -> DataFrame:
    """Deterministic domain-mixture resampling: downsample each group so
    the surviving corpus matches the ``targets`` proportions, keeping as
    much data as possible (the group whose target/current ratio is
    highest is kept whole; every other group is hash-thinned to match).
    Groups absent from ``targets`` are dropped.

    The acceptance decision is a pure function of (id, salt, the tiny
    per-group count table), so the same rows survive on every engine,
    partitioning, and cluster size — the property that makes a 100 TB
    mixture job restartable and auditable. Plan: one groupBy for counts
    (map-side combined), a broadcast join of the per-group threshold,
    and a scan-level hash filter. No global sort, no sampling RNG.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    t_map = F.create_map(*[F.lit(x) for kv in targets.items() for x in kv])
    ratios = (
        counts.withColumn("_t", t_map[F.col(group_col)].cast("double"))
        .filter(F.col("_t").isNotNull())
        .withColumn("_ratio", F.col("_t") / F.col("_n"))
    )
    mx = ratios.agg(F.max("_ratio").alias("_mx"))
    thresholds = ratios.crossJoin(F.broadcast(mx)).select(
        F.col(group_col),
        F.floor(F.lit(float(resolution)) * F.col("_ratio") / F.col("_mx"))
        .cast("long")
        .alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(hash_bucket(id_col, resolution, salt) < F.col("_thr"))
        .drop("_thr")
    )


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    m: int,
    strata_col: str | None = None,
    salt: str = "",
    out_rank: str = "sample_rank",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``m`` rows per stratum chosen by the Efraimidis–Spirakis A-ES
    scheme — row i survives with probability proportional to its
    weight, exactly as if drawn sequentially without replacement.

    A-ES draws u_i ~ U(0,1] and keeps the m smallest
    ``k_i = -ln(u_i)/w_i``. Here u_i is NOT random: it derives from
    md5(id || salt) (60 bits → (0,1]), so the sample is a pure function
    of (id, weight, salt) — the same rows survive on every engine,
    partitioning, and cluster size, and a re-draw is just a new salt.
    The whole operator is a narrow projection + one per-stratum window
    rank: no RNG state, no driver coordination, no global sort
    (``strata_col=None`` degrades to ONE partition's external sort —
    fine for final top-m extraction, wrong for per-domain sampling at
    scale; pass the stratum).

    Rows with NULL or non-positive weight are excluded (they would
    have survival probability 0 / undefined key)."""
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        hex_prefix_to_long(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 15
        )
        + F.lit(1)
    ) / F.lit(float(1 << 60))
    key = -F.log(u) / wcol
    part = [strata_col] if strata_col else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.filter(wcol.isNotNull() & (wcol > 0))
        .withColumn(out_rank, F.row_number().over(w))
        .filter(F.col(out_rank) <= m)
    )
