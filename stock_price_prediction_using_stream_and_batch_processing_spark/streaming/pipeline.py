"""The streaming tick pipeline — reference ``stream_consumer.py``
semantics, Spark-first.

Reference shape (SURVEY §3.1): Kafka → ``from_json`` parse → per
micro-batch: JDBC append + driver-side trailing-5 LSTM predict.
Differences here, by design:
- Sink is an idempotent Parquet append with a checkpoint (the reference
  had no checkpoint and at-least-once JDBC — §2.8).
- Prediction happens INSIDE the plan (window + Arrow-batched UDF), not
  on collected Pandas — executors scale it out.
- Metrics come from a ``StreamingQueryListener`` instead of Python
  lists (``stream_consumer.py:48``).
- Tests drive it with a file source + ``availableNow`` (no Kafka in the
  container); the source swaps to ``format("kafka")`` untouched because
  parsing operates on the same (value: string) contract.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.inference import predict_over_windows
from ..operators import windows
from ..sources.ticks import tick_schema
from .stateful import continuous_trailing_windows


def parse_ticks(
    raw: DataFrame,
    value_col: str = "value",
    drop_malformed: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Kafka-wire parse: binary/string JSON value -> typed tick columns
    (reference P0a-P0c, ``stream_consumer.py:96-98``).

    ``drop_malformed`` (default) discards rows whose essential fields
    (symbol, timestamp, price) failed to parse — otherwise broken wire
    messages become null-timestamp rows that poison the raw table and
    sort first in every window. (The reference had no handling at all:
    a malformed message yields nulls via ``from_json`` and is written
    to MySQL as-is.)

    ``keep_cols`` carries source metadata columns (Kafka's topic /
    partition / offset / key) through the parse unchanged — the
    reference dropped them; an auditable pipeline wants the provenance
    next to the payload (plans/streamplans.kafka_wire_parse_events
    differentially checks this full wire surface)."""
    clash = set(keep_cols) & {f.name for f in tick_schema.fields}
    if clash:
        # Kafka metadata includes a column literally named 'timestamp';
        # keeping it unaliased would collide with the payload field of
        # the same name — two identical column names, and the malformed
        # filter below would raise AMBIGUOUS_REFERENCE. Fail loudly.
        raise ValueError(
            f"keep_cols {sorted(clash)} collide with tick_schema payload fields — "
            "alias the metadata column before parse_ticks (e.g. "
            "raw.withColumnRenamed('timestamp', 'kafka_ts'))"
        )
    kept = [F.col(c) for c in keep_cols]
    data = raw.select(
        *kept, F.from_json(F.col(value_col).cast("string"), tick_schema).alias("data")
    )
    if drop_malformed:
        # Parse ONCE per row (r17, guide §4.4's duplication with a JVM
        # expression): without a barrier the optimizer pushes the
        # malformed filter BELOW this projection, substituting the
        # from_json alias into each null check — the measured plan ran
        # FOUR Jackson parses per row (three schema-pruned single-field
        # from_json calls in the Filter + the full one in the Project,
        # all outside codegen). The barrier is a nondeterministic no-op
        # column that the filter REFERENCES via a vacuously-true
        # conjunct (rand(0) ∈ [0,1) is always < 2): referenced, it
        # survives column pruning, and a project with a nondeterministic
        # field blocks PushPredicateThroughNonJoin — the filter stays
        # ABOVE the parse and reads fields of the one materialized
        # struct (an unreferenced barrier column was pruned first and
        # the push happened anyway; measured ~1.3 s -> ~0.4 s on a
        # 100k-row wire batch). Row semantics are unchanged — the extra
        # conjunct is constant-true and the null checks are identical
        # (pinned by the malformed tests + the kafka wire oracle).
        data = data.withColumn("_parse_once_barrier", F.rand(0))
        data = data.filter(
            (F.col("_parse_once_barrier") < F.lit(2.0))
            & F.col("data.symbol").isNotNull()
            & F.col("data.timestamp").isNotNull()
            & F.col("data.price").isNotNull()
        )
    return data.select(*keep_cols, "data.*")


def kafka_tick_source(spark: SparkSession, bootstrap: str, topic: str = "stock_ticks") -> DataFrame:
    """The production source (reference S1, ``stream_consumer.py:89-93``).
    Not exercisable in the test container (no Kafka broker/jar) — kept
    as the documented swap-in for ``file_tick_source``."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )


def file_tick_source(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based stand-in for the Kafka source: each line is one JSON
    tick message (the producer wire format). ``max_files_per_trigger``
    splits the backlog into multiple micro-batches — the test analogue of
    Kafka's ``maxOffsetsPerTrigger``."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def idempotent_epoch_write(df: DataFrame, path: str, epoch_id: int) -> None:
    """EXACTLY-ONCE foreachBatch parquet write: write straight into the
    epoch's own partition directory (``_epoch=<id>/``) with overwrite. A
    plain ``mode("append")`` is at-least-once — a crash between the
    write and the checkpoint commit re-runs the epoch and DUPLICATES its
    rows; the epoch-scoped overwrite makes the retry replace its own
    output instead. (The reference's JDBC append had exactly this
    duplication window — SURVEY §2.8.)

    Writing the directory directly (rather than dynamic
    ``partitionOverwriteMode`` + ``partitionBy``) keeps the per-batch
    cost O(this epoch): no staging-dir dance and no listing of the
    other epochs' output — measured ~3× cheaper per micro-batch, and
    the layout is identical (partition discovery reads ``_epoch`` from
    the directory name)."""
    df.write.mode("overwrite").parquet(f"{path.rstrip('/')}/_epoch={int(epoch_id)}")


def idempotent_epoch_write_arrow(df: DataFrame, path: str, epoch_id: int) -> None:
    """Driver-side Arrow twin of :func:`idempotent_epoch_write` for
    TICK-SCALE micro-batches (a handful of rows): pull the batch over
    Arrow (``toArrow`` — one job, no shuffle) and write the epoch's one
    parquet file directly with pyarrow, atomically via temp-file +
    ``os.replace``. Same directory layout and idempotency contract as
    the distributed writer (retries overwrite the same file), but none
    of the Hadoop committer machinery (_temporary staging, task commit,
    rename, _SUCCESS) — measured ~100 ms less per micro-batch at the
    reference's 1-3-tick batches.

    This is the one deliberate driver-side hot path in the engine, and
    it is size-gated by design: the caller opts in ONLY for load shapes
    where the batch is O(rows-per-trigger) tiny (the reference itself
    persisted every batch from the driver — a JDBC append,
    ``stream_consumer.py:61-69``). Bulk backfills keep the distributed
    writer. The temp name starts with ``.`` so Spark's reader ignores a
    crash-orphaned partial file."""
    _write_epoch_arrow_table(df.toArrow(), path, epoch_id)


def _write_epoch_arrow_table(tbl, path: str, epoch_id: int) -> None:
    """Shared atomic epoch write for an in-hand Arrow table (the tail of
    :func:`idempotent_epoch_write_arrow`, also fed directly by the
    driver compute fast path)."""
    import pyarrow.parquet as pq

    d = f"{path.rstrip('/')}/_epoch={int(epoch_id)}"
    os.makedirs(d, exist_ok=True)
    target = "part-0.parquet"
    # Order matters for replayed epochs previously written by the
    # DISTRIBUTED writer (multiple part-* files, none named our
    # target): the new file lands ATOMICALLY first (temp + os.replace),
    # THEN stale files are removed — so a concurrent reader never sees
    # an empty epoch. The worst transient during that cleanup instant
    # (or after a crash mid-cleanup, until the retry finishes) is
    # old+new rows together — duplicates, healed by the replay itself;
    # the reverse order (delete-then-write, the previous code) exposed
    # a MISSING-rows window, which no retry can excuse to a reader.
    tmp = os.path.join(d, f"._{target}.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(d, target))
    for name in os.listdir(d):
        if name != target and not name.startswith("."):
            os.remove(os.path.join(d, name))


def _epoch_source_files(checkpoint_path: str, epoch_id: int, source_idx: int = 0) -> list[str] | None:
    """The micro-batch's exact file list, read from the file source's
    own metadata log (``<checkpoint>/sources/<idx>/<batchId>`` — the
    stable ``v1`` CompactibleFileStreamLog format, one JSON entry per
    file with its ``batchId``; compact files carry all history, so
    entries are filtered by epoch). This is the same record
    ``FileStreamSource.getBatch`` plans the batch from — the
    authoritative answer to "which files are in epoch N", already
    durable before ``foreachBatch`` runs. Returns local filesystem
    paths, or ``None`` on any anomaly (non-local scheme, unknown log
    version, missing file) — callers must then fall back to the
    distributed read."""
    import json
    from urllib.parse import unquote, urlparse

    ckpt = checkpoint_path
    if "://" in ckpt or ckpt.startswith("file:"):
        parts = urlparse(ckpt)
        if parts.scheme not in ("", "file"):
            return None
        ckpt = unquote(parts.path)
    d = os.path.join(ckpt, "sources", str(source_idx))
    for name in (str(epoch_id), f"{epoch_id}.compact"):
        log_file = os.path.join(d, name)
        if os.path.exists(log_file):
            break
    else:
        return None
    out: list[str] = []
    try:
        with open(log_file, encoding="utf-8") as f:
            if f.readline().strip() != "v1":
                return None
            for line in f:
                line = line.strip()
                if not line:
                    continue
                e = json.loads(line)
                if e.get("batchId") != epoch_id:
                    continue  # compact log: other epochs' entries
                uri = str(e.get("path", ""))
                parts = urlparse(uri)
                if parts.scheme not in ("", "file"):
                    return None
                out.append(unquote(parts.path))
    except (OSError, ValueError):
        return None
    return out


# Extended-format ISO-8601 instants ONLY — the shapes Python
# fromisoformat and Spark's timestamp cast parse to the same instant:
# calendar date, 'T' or ' ' separator, full hh:mm:ss, optional ≤6
# fractional digits (both engines are microsecond-exact there), and an
# EXPLICIT zone with a colon (or Z). Everything fromisoformat would
# additionally take (basic format, week/ordinal dates, arbitrary
# separator chars, 7-9 fraction digits, colonless offsets) refuses the
# fast path instead of guessing Spark's verdict.
_STRICT_ISO_TS_RE = re.compile(
    # offsets: Python fromisoformat accepts up to ±23:59 but Java
    # ZoneOffset (Spark's parse) caps at ±18:00 — admit only the
    # common range so both parsers agree (|hh| ≤ 17, any minute, plus
    # exactly ±18:00); anything hotter falls to the distributed parse
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d{1,6})?"
    r"(Z|[+-](?:0\d|1[0-7]):[0-5]\d|[+-]18:00)$"
)


def _parse_tick_wire_rows(lines) -> list[dict] | None:
    """Driver-side twin of ``parse_ticks`` (``from_json`` on
    ``tick_schema`` + drop-malformed filter) for STRICT well-formed wire
    rows only. Two outcomes per line, both matching Spark exactly:
    SKIP the line where Spark's PERMISSIVE parse yields a null-essential
    row the filter drops (unparseable JSON, JSON scalar, missing/null
    symbol/timestamp/price), or emit the typed row. Any shape whose
    Spark semantics are subtler than that — non-string symbol (Spark
    keeps the raw JSON text), naive timestamp (parses in the SESSION
    zone), string/bool numerics, int64 overflow, JSON array input —
    returns ``None``: the caller must hand the WHOLE batch to the
    distributed parse rather than guess. Differentially pinned against
    ``parse_ticks`` over an adversarial corpus in
    tests/test_streaming.py."""
    import datetime as dt
    import json

    rows: list[dict] = []
    for raw_line in lines:
        s = raw_line.strip()
        if not s:
            continue  # from_json("") -> null row -> dropped
        try:
            obj = json.loads(s)
        except ValueError:
            continue  # malformed -> PERMISSIVE null row -> dropped
        if isinstance(obj, list):
            return None  # array-over-struct: let Spark decide
        if not isinstance(obj, dict):
            continue  # JSON scalar -> null struct -> dropped
        sym = obj.get("symbol")
        ts_raw = obj.get("timestamp")
        price_raw = obj.get("price")
        if sym is None or ts_raw is None or price_raw is None:
            continue  # null essential -> dropped by the filter
        if not isinstance(sym, str) or not isinstance(ts_raw, str):
            return None
        if isinstance(price_raw, bool) or not isinstance(price_raw, (int, float)):
            return None
        # Python 3.11 fromisoformat is WIDER than Spark's timestamp
        # parse: it accepts basic format (20240101T000001+00:00),
        # week/ordinal dates (2024-W01-1T...), ANY separator character
        # at position 10, and >6 fractional digits — shapes Spark's
        # from_json casts to null (row dropped) or truncates
        # differently. Gate to the strict extended-format subset BOTH
        # parsers treat identically; anything else: Spark arbitrates.
        if _STRICT_ISO_TS_RE.match(ts_raw) is None:
            return None
        try:
            ts = dt.datetime.fromisoformat(ts_raw)
        except ValueError:
            return None  # format outside ISO-8601: Spark arbitrates
        if ts.tzinfo is None:
            return None  # session-zone parse: Spark arbitrates
        vol_raw = obj.get("volume")
        if vol_raw is None:
            vol = None
        elif isinstance(vol_raw, bool) or not isinstance(vol_raw, int):
            return None
        elif not (-(2**63) <= vol_raw < 2**63):
            return None
        else:
            vol = vol_raw
        rows.append(
            {
                "symbol": sym,
                "timestamp": ts.astimezone(dt.timezone.utc),
                "price": float(price_raw),
                "volume": vol,
            }
        )
    return rows


def _driver_read_tick_batch(
    checkpoint_path: str, epoch_id: int, session_tz: str, max_bytes: int = 4 << 20
):
    """ZERO-SPARK-JOB micro-batch read for tick-scale file batches: the
    epoch's files from the checkpoint source log, parsed on the driver
    (:func:`_parse_tick_wire_rows`), returned as the same Arrow table
    ``batch_df.toArrow()`` would produce (schema pinned to Spark's
    Arrow conversion of ``tick_schema`` under the session zone).

    Why: at the reference's 1-3-tick batches the ``toArrow`` collect is
    one distributed job per batch — measured ~30-40 ms of pure
    scheduling for ~100 bytes of data, the entire remaining gap between
    the pipeline and the empty-foreachBatch machinery floor. The
    reference consumer parsed every message on the driver anyway
    (``stream_consumer.py:96-105``); this does the same, WITHOUT giving
    up the checkpoint fence (offsets/WAL/commits unchanged — only the
    batch-data fetch is local). Returns ``None`` (caller falls back to
    the distributed read) whenever the batch is not provably tiny,
    local, and strictly well-formed."""
    import pyarrow as pa

    files = _epoch_source_files(checkpoint_path, epoch_id)
    if files is None:
        return None
    total = 0
    for p in files:
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
        if total > max_bytes:
            return None  # bulk backfill: distributed scan owns it
    rows: list[dict] = []
    for p in files:
        try:
            with open(p, encoding="utf-8", errors="replace") as f:
                parsed = _parse_tick_wire_rows(f)
        except OSError:
            return None
        if parsed is None:
            return None
        rows.extend(parsed)
    schema = pa.schema(
        [
            pa.field("symbol", pa.string()),
            pa.field("timestamp", pa.timestamp("us", tz=session_tz)),
            pa.field("price", pa.float64()),
            pa.field("volume", pa.int64()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def predict_ticks_arrow(tbl, seq_len: int, mn: float | None = None, mx: float | None = None):
    """Driver-side Arrow twin of the per-batch window+predict plan, for
    TICK-SCALE micro-batches: trailing-``seq_len`` recency-weighted
    linear prediction computed directly on the collected Arrow table —
    BIT-FOR-BIT identical to the distributed
    ``trailing_collect(tiebreak=[price, volume]) -> linear_predict_column``
    path (same sort keys and null placement as Spark's window sort,
    same IEEE operation order as the ``zip_with``/``aggregate`` fold:
    scale, multiply, left-fold accumulate, unscale — pinned by
    tests/test_streaming.py's fast-path≡distributed differential).

    Why it exists: at 1-3 rows per micro-batch the distributed plan's
    cost is ~100% per-batch Catalyst analysis + job scheduling, not
    compute. Collecting the parsed batch once (``toArrow`` — the single
    job the batch pays) and folding 5 floats per row on the driver
    removes the window/predict plan entirely from the hot path. Strictly
    size-gated, same contract as :func:`idempotent_epoch_write_arrow`
    (the reference itself predicted driver-side per batch,
    ``stream_consumer.py:50-54``); bulk backfills keep the distributed
    plan, which is the same declarative operator the batch job uses."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.scaling import REFERENCE_SCALER_MAX, REFERENCE_SCALER_MIN
    from ..ml.predictor import LinearWindowModel

    mn = REFERENCE_SCALER_MIN if mn is None else mn
    mx = REFERENCE_SCALER_MAX if mx is None else mx
    if tbl.num_rows:
        # Spark window sort order: (partition key, ORDER BY keys) with
        # ascending NULLS FIRST — match it exactly.
        idx = pc.sort_indices(
            tbl,
            sort_keys=[
                ("symbol", "ascending"),
                ("timestamp", "ascending"),
                ("price", "ascending"),
                ("volume", "ascending"),
            ],
            null_placement="at_start",
        )
        tbl = tbl.take(idx)
    weights = [float(w) for w in LinearWindowModel(seq_len).weights]
    span = mx - mn
    symbols = tbl.column("symbol").to_pylist()
    prices = tbl.column("price").to_pylist()
    preds: list[float | None] = []
    hist: list[float] = []
    prev: object = object()
    for s, p in zip(symbols, prices):
        if s != prev:
            hist = []
            prev = s
        hist.append(p)
        if len(hist) >= seq_len:
            acc = 0.0
            for v, w in zip(hist[-seq_len:], weights):
                acc += ((v - mn) / span) * w
            preds.append(acc * span + mn)
        else:
            preds.append(None)  # partial window -> NULL, like zip_with padding
    return tbl.append_column("predicted_price", pa.array(preds, type=pa.float64()))


def run_tick_stream(
    spark: SparkSession,
    source: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    seq_len: int = 5,
    available_now: bool = True,
    mllib_model_path: str | None = None,
    keras_path: str | None = None,
    small_batch_coalesce: int | None = 1,
    guard_empty_batches: bool = False,
    async_progress: bool = False,
    driver_arrow_sink: bool = False,
    driver_arrow_compute: bool = False,
):
    """Parse -> persist + predict in ONE sink write per micro-batch, via
    ``foreachBatch`` (reference S4 with the imperative body re-expressed
    as DataFrame ops).

    The combined sink carries every tick (the raw table of record) plus
    a ``predicted_price`` column that is NULL for the first seq_len-1
    ticks of a batch — ``read_stream_ticks`` / ``read_stream_predictions``
    are the two reference-shaped views over it. One write instead of the
    earlier raw+predictions pair halves the per-micro-batch job+commit
    count — the dominant latency term at reference tick rates.

    Per-batch windows reproduce the reference's cross-batch gap
    semantics (windows never span micro-batches —
    ``stream_consumer.py:72-76``); streaming/stateful.py provides the
    continuous alternative.

    ``small_batch_coalesce``: at the reference tick rate a micro-batch
    holds a handful of rows, so the default ``coalesce(1)`` makes the
    batch SinglePartition — which already satisfies the trailing
    window's ClusteredDistribution(symbol), so EnsureRequirements plans
    NO Exchange: the whole batch (scan -> sort -> window -> predict ->
    sink) is one stage, one task. Set ``None`` for bulk backfills
    (large ``maxFilesPerTrigger``) where scan/shuffle parallelism
    matters more than per-batch constants.

    ``guard_empty_batches``: the reference's P0d empty-batch guard as an
    opt-in — ``isEmpty()`` costs one extra Spark job on EVERY batch to
    skip work on the rare empty one. Off by default: every operator
    below is empty-safe, and an empty epoch write is harmless (readers
    see a zero-row partition).

    ``async_progress``: write the offset WAL / commit log
    ASYNCHRONOUSLY (``asyncProgressTrackingEnabled``) instead of
    fencing every micro-batch on two checkpoint fsyncs. Trade: failure
    recovery replays from the last flushed offset, so the guarantee
    drops from exactly-once to at-least-once FOR THE OFFSET LOG — but
    the sink write itself stays idempotent (epoch-keyed overwrite), so
    replayed epochs overwrite their own output and the END-TO-END
    result is still duplicate-free. This matches (and still beats) the
    reference's unfenced consumer loop, which has no recovery log at
    all. Requires a live (processingTime) trigger — Spark rejects it
    under availableNow.

    ``driver_arrow_sink``: persist each micro-batch with
    :func:`idempotent_epoch_write_arrow` (driver-side pyarrow, no
    committer) instead of the distributed parquet writer — for
    tick-scale load shapes only; see that function's docstring for the
    size-gating rationale.

    ``driver_arrow_compute``: also compute the per-batch window+predict
    on the driver (:func:`predict_ticks_arrow` — one ``toArrow`` job on
    the parsed batch, then a 5-float fold per row), removing per-batch
    Catalyst analysis of the window plan from the hot path. Implies the
    Arrow sink; linear predictor only (raises with an MLlib/Keras
    model — real-model inference belongs in the distributed plan).
    Output is bit-for-bit identical to the distributed path.

    ``mllib_model_path`` swaps the default predictor for a saved MLlib
    pipeline (ml/training.save_model) scored JVM-side; ``keras_path``
    swaps in a Keras artifact via the Arrow UDF — the engine's
    retrained-model hot-swap, mirroring the reference loading
    ``lstm_model.keras`` at startup (``stream_consumer.py:43-45``).
    """
    if driver_arrow_compute and (mllib_model_path is not None or keras_path is not None):
        raise ValueError(
            "driver_arrow_compute supports only the linear fallback predictor; "
            "model-artifact inference runs in the distributed plan"
        )
    parsed = parse_ticks(source)
    # captured once at stream build: the zone Spark's Arrow conversion
    # stamps on TimestampType, needed by the driver fast read to build
    # a toArrow-identical table
    session_tz = spark.conf.get("spark.sql.session.timeZone")
    if mllib_model_path is not None:
        from ..ml.training import load_saved_model, score_windows

        model = load_saved_model(mllib_model_path)  # once, at stream build

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if guard_empty_batches and batch_df.isEmpty():  # reference P0d guard
            return
        if driver_arrow_compute:
            # zero jobs when the epoch's files are tiny+local+strictly
            # well-formed (the reference load shape); else one job
            # (collect the parsed batch), zero chained plans
            tbl = _driver_read_tick_batch(checkpoint_path, epoch_id, session_tz)
            if tbl is None:
                tbl = batch_df.toArrow()
            _write_epoch_arrow_table(predict_ticks_arrow(tbl, seq_len), sink_path, epoch_id)
            return
        if small_batch_coalesce:
            batch_df = batch_df.coalesce(small_batch_coalesce)
        # tiebreak (price, volume) — matching streaming/stateful.py's
        # deliberate tied-timestamp order: tiebreak="timestamp" (the old
        # value) duplicated the ORDER key, leaving equal-ts ticks in
        # nondeterministic order, so predictions could differ between a
        # run and its epoch replay and between this path and the
        # stateful one
        win = windows.trailing_collect(
            batch_df, "symbol", "timestamp", "price", seq_len,
            tiebreak=["price", "volume"], full_only=False,
        )
        if mllib_model_path is not None:
            # MLlib transform can't see partial windows (null features
            # error in the assembler): score full windows, union the rest
            full = win.filter(F.size("window_values") == seq_len)
            rest = win.filter(F.size("window_values") < seq_len).withColumn(
                "predicted_price", F.lit(None).cast("double")
            )
            pred = score_windows(model, full, "window_values", seq_len=seq_len).unionByName(rest)
        else:
            # linear fallback: native expression, NULL on partial windows
            # (zip_with null padding propagates); keras: Arrow UDF -> NaN
            pred = predict_over_windows(win, "window_values", seq_len=seq_len, keras_path=keras_path)
            if keras_path is not None:
                pred = pred.withColumn(
                    "predicted_price",
                    F.when(~F.isnan("predicted_price"), F.col("predicted_price")),
                )
        out = pred.drop("window_values")
        if driver_arrow_sink:
            idempotent_epoch_write_arrow(out, sink_path, epoch_id)
        else:
            idempotent_epoch_write(out, sink_path, epoch_id)

    if async_progress and available_now:
        raise ValueError(
            "async_progress requires a processing-time trigger: Spark rejects "
            "asyncProgressTrackingEnabled under trigger(availableNow=True) — "
            "pass available_now=False"
        )
    writer = (
        parsed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(process_batch)
    )
    if async_progress:
        writer = writer.option("asyncProgressTrackingEnabled", "true")
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q


def read_stream_output(spark: SparkSession, path: str) -> DataFrame:
    """Read a sink written by ``idempotent_epoch_write`` with the epoch
    bookkeeping column dropped."""
    df = spark.read.parquet(path)
    return df.drop("_epoch") if "_epoch" in df.columns else df


def read_stream_ticks(spark: SparkSession, path: str) -> DataFrame:
    """The raw-tick view of the combined sink (reference
    ``stock_ticks_raw``): every ingested tick, prediction column
    dropped."""
    return read_stream_output(spark, path).drop("predicted_price")


def read_stream_predictions(spark: SparkSession, path: str) -> DataFrame:
    """The predictions view of the combined sink: ticks that closed a
    full trailing window in their micro-batch."""
    return (
        read_stream_output(spark, path)
        .filter(F.col("predicted_price").isNotNull())
        .select("symbol", "timestamp", "price", "predicted_price")
    )


def read_epoch_marker(root: str) -> int:
    """Last merged epoch id recorded at ``root`` (the replay fence for
    NON-idempotent foreachBatch merges — bar counters, CMS addition).
    -1 when absent/unreadable. Local filesystem paths only — see
    :func:`maintain_bars_batch` for the URI hazard."""
    if "://" in root:
        raise ValueError(f"epoch marker requires a local path, got {root!r}")
    try:
        with open(os.path.join(root, "_last_epoch")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def advance_epoch_marker(root: str, epoch_id: int) -> None:
    """Atomically record ``epoch_id`` as merged (temp + ``os.replace``).
    MUST be called only after the epoch's merge completed; a crash
    between merge and marker re-merges one epoch on restart — the
    documented parquet-only bound."""
    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, "_last_epoch")
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(int(epoch_id)))
    os.replace(tmp, marker)


def epoch_guarded(store: str, epoch_id: int, refresh_fn) -> bool:
    """Run ``refresh_fn()`` exactly once per epoch: skip if the marker
    at ``store + "_marker"`` already covers ``epoch_id`` (foreachBatch
    replay), else refresh then advance the marker. THE shared fence for
    non-idempotent merges (counter ADDs: CMS, histograms) — one copy of
    the skip/refresh/advance protocol instead of one per maintenance
    face. Returns True if the refresh ran. Same non-transactionality
    bound as :func:`maintain_bars_batch` (crash between refresh and
    marker re-merges one epoch), and the same marker-lifecycle rule:
    the marker must reset together with the stream's checkpoint and the
    store."""
    marker_root = store + "_marker"
    if epoch_id <= read_epoch_marker(marker_root):
        return False
    refresh_fn()
    advance_epoch_marker(marker_root, epoch_id)
    return True


def maintain_bars_batch(
    spark: SparkSession,
    bars_root: str,
    batch_df: DataFrame,
    epoch_id: int,
    duration: str = "1 minute",
    marker_root: str | None = None,
) -> bool:
    """One epoch of streaming continuous-aggregate maintenance: merge
    this batch's ticks into the materialized fine-bar table
    (operators/windows.refresh_ohlc_fine — only the affected
    (symbol, bucket) bars are touched; late ticks take the same path),
    then advance the epoch marker. Returns False if the epoch was
    already merged (foreachBatch replay) — the guard that keeps a
    retried epoch from double-counting its rows into the bars. The
    marker write is atomic (temp + replace) but not transactional with
    the merge itself; a crash exactly between them re-merges one epoch.
    Closing that window needs a transactional table format
    (Delta/Iceberg MERGE) — documented limit of a parquet-only sink,
    still strictly stronger than the reference's unfenced at-least-once
    JDBC append.

    ``marker_root`` is where the epoch marker lives; it MUST share the
    checkpoint's lifecycle (epoch ids restart at 0 when the checkpoint
    is cleared, and a marker that outlives its checkpoint makes every
    post-reset batch look like a replay — silently dropping all data).
    ``run_bar_maintenance_stream`` passes the checkpoint dir itself.
    The symmetric hazard: clearing the checkpoint while KEEPING the
    bars table re-merges the whole stream into existing bars
    (double-counts) — checkpoint, marker, and bars table form one unit;
    reset all three together. Local filesystem paths only (the marker
    uses OS file primitives; a URI checkpoint would silently write the
    marker somewhere else and resurrect the stale-marker data loss) —
    enforced below; cloud deployments want a transactional table
    format here anyway."""
    from ..operators.windows import refresh_ohlc_fine

    root = marker_root or bars_root
    if "://" in root:
        raise ValueError(
            f"maintain_bars_batch requires a local marker/checkpoint path, got {root!r}"
        )
    if epoch_id <= read_epoch_marker(root):
        return False
    os.makedirs(bars_root, exist_ok=True)
    refresh_ohlc_fine(
        spark, os.path.join(bars_root, "bars"), batch_df,
        key="symbol", ts="timestamp", value="price", seq="timestamp", duration=duration,
    )
    advance_epoch_marker(root, epoch_id)
    return True


def run_bar_maintenance_stream(
    spark: SparkSession,
    source: DataFrame,
    bars_root: str,
    checkpoint_path: str,
    duration: str = "1 minute",
    available_now: bool = True,
):
    """Streaming half of the hypertable-rollup story: the tick stream
    itself maintains the materialized minute-bar table, one
    :func:`maintain_bars_batch` merge per micro-batch. Coarser
    resolutions (hour/day) then derive from the bar table with
    ``merge_ohlc_bars`` at query time — no raw-history rescan, no
    unbounded streaming state (the bars table IS the state, and it
    lives on disk)."""
    parsed = parse_ticks(source)

    def _maint(batch_df: DataFrame, epoch_id: int) -> None:
        # marker shares the checkpoint's lifecycle (see maintain_bars_batch)
        maintain_bars_batch(
            spark, bars_root, batch_df, epoch_id, duration, marker_root=checkpoint_path
        )

    writer = (
        parsed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(_maint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_continuous_prediction_stream(
    spark: SparkSession,
    source: DataFrame,
    predictions_path: str,
    checkpoint_path: str,
    seq_len: int = 5,
    available_now: bool = True,
):
    """The gapless upgrade of ``run_tick_stream``'s per-batch predictions:
    stateful cross-batch trailing windows (streaming/stateful.py) feed
    the same Arrow inference UDF, so EVERY tick from the ``seq_len``-th
    on gets a prediction regardless of micro-batch boundaries — the
    continuity the reference lacks (``stream_consumer.py:72-76``,
    SURVEY §7 hard part i). Output is a checkpointed append-mode Parquet
    sink."""
    parsed = parse_ticks(source)
    win = continuous_trailing_windows(parsed, seq_len=seq_len)

    # Inference runs inside foreachBatch, not chained onto the stateful
    # stream: Spark 4.1 crashes feeding applyInPandasWithState output
    # rows into a downstream pandas_udf (GenericInternalRow
    # ClassCastException in ArrowEvalPython). The per-batch DataFrame is
    # a clean boundary; the prediction math and checkpointing are
    # unchanged.
    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        pred = predict_over_windows(batch_df, "window_values", seq_len=seq_len)
        out = pred.select("symbol", "timestamp", "price", "predicted_price")
        idempotent_epoch_write(out, predictions_path, epoch_id)

    writer = (
        win.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(write_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
