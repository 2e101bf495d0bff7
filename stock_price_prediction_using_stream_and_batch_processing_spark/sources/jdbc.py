"""JDBC interop — the external-database seam the reference used as its
table of record.

The reference appended every micro-batch to MySQL
(``/root/reference/stream_consumer.py:61-69``, config ``:34-40``) and
read it back with the sort+limit pushed into the database as a derived
table (``/root/reference/batch_processor.py:72-79``, pushdown ``:76``).
This engine's default durable store is partitioned Parquet
(sources/sinks.py) — but "same capabilities" includes talking to an
external RDBMS when one is the system of record, so this module ships
the reader/writer wrappers with the same semantics.

Environment block (no database exists in the test sandbox, so tests
verify the constructed option plumbing, not a live round-trip):

- the JDBC driver jar must be on the Spark classpath
  (``spark.jars`` / ``--jars``; the reference shipped
  ``mysql-connector-j-9.3.0.jar`` in-repo and wired it via
  ``spark.driver.extraClassPath`` — ``batch_processor.py:27-29``);
- connectivity/credentials come from the caller — nothing here reads
  env vars or hardcodes endpoints.

Scale notes (100 TB posture):
- A single-connection JDBC read is a one-task scan. ``read_jdbc``
  exposes Spark's partitioned-read contract (partition_column /
  lower_bound / upper_bound / num_partitions) so big tables fan out
  across executors; without it Spark reads on one executor thread.
- ``pushdown_subquery`` pushes ORDER BY ... LIMIT into the database —
  the top-k never crosses the wire (reference S3 semantics). For
  predicate pushdown on a plain table, Spark's JDBC source already
  pushes filters; verify with PushedFilters in `.explain`.
- Writes: ``batchsize`` batches INSERTs; ``truncate=true`` on
  overwrite avoids re-creating the table (keeps indexes/grants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_options(
    url: str,
    dbtable: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    **extra: str,
) -> dict[str, str]:
    """The option block both directions share (reference
    ``MYSQL_CONFIG``, ``stream_consumer.py:34-40``). ``extra`` passes
    through source-specific options (batchsize, fetchsize,
    sessionInitStatement, ...)."""
    opts = {
        "url": url,
        "driver": driver,
        "dbtable": dbtable,
        "user": user,
        "password": password,
    }
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


# Dialect presets for pushdown_subquery: (identifier quote, limit
# style). "mysql" is the reference's actual target engine
# (batch_processor.py:74-79 — backtick-quoted identifiers, LIMIT k);
# "derby" is the live-testable embedded engine (ANSI double quotes,
# FETCH FIRST — Derby rejects LIMIT); "ansi" is the portable default
# (also Oracle 12c+/SQLServer 2012+ via the standard fetch clause);
# "postgres" folds unquoted identifiers to lowercase so it quotes like
# ANSI but accepts LIMIT.
DIALECTS: dict[str, tuple[str, str]] = {
    "mysql": ("`", "limit"),
    "derby": ('"', "fetch"),
    "ansi": ('"', "fetch"),
    "postgres": ('"', "limit"),
}


def pushdown_subquery(
    table: str,
    order_by: str | None = None,
    descending: bool = True,
    limit: int | None = None,
    limit_style: str | None = None,
    ident_quote: str | None = None,
    dialect: str | None = None,
) -> str:
    """Derived-table string that pushes sort+limit into the database —
    the reference's latest-k fetch shape
    (``batch_processor.py:76``: ``(SELECT * FROM stock_ticks_raw ORDER
    BY timestamp DESC LIMIT 10000) as tmp``).

    ``dialect`` ("mysql" / "derby" / "ansi" / "postgres") picks both
    knobs from :data:`DIALECTS`; explicit ``limit_style`` /
    ``ident_quote`` override it. With neither given, defaults are
    unquoted identifiers + ``LIMIT`` (the reference's literal MySQL
    string, backward compatible).

    ``limit_style``: ``"limit"`` (MySQL/Postgres/SQLite ``LIMIT n``) or
    ``"fetch"`` (ANSI/Derby/Oracle/SQLServer ``FETCH FIRST n ROWS
    ONLY``). ``ident_quote`` wraps the order-by column for databases
    that fold unquoted identifiers (Derby/Postgres uppercase/lowercase
    them, but Spark's JDBC writer CREATEs columns quoted, so the stored
    names are case-exact): pass ``'"'`` for ANSI double quotes,
    ``'`'`` for MySQL backticks, default unquoted."""
    if dialect is not None:
        if dialect not in DIALECTS:
            raise ValueError(f"unknown dialect {dialect!r}; known: {sorted(DIALECTS)}")
        dq, ds = DIALECTS[dialect]
        ident_quote = dq if ident_quote is None else ident_quote
        limit_style = ds if limit_style is None else limit_style
    limit_style = "limit" if limit_style is None else limit_style
    ident_quote = "" if ident_quote is None else ident_quote
    if limit_style not in ("limit", "fetch"):
        raise ValueError(f"limit_style must be 'limit' or 'fetch', got {limit_style!r}")
    # The table operand interpolates into SQL too — hold it to the same
    # discipline as unquoted order_by: plain (possibly schema-qualified
    # or quoted) identifier characters only, nothing that can terminate
    # the statement or open a comment.
    if not all(ch.isalnum() or ch in '_."' + ("`" if ident_quote == "`" else "") for ch in table):
        raise ValueError(
            f"table must be a plain (optionally schema-qualified/quoted) identifier, got {table!r}"
        )
    q = f"SELECT * FROM {table}"
    if order_by is not None:
        # Identifiers interpolate into SQL: double any embedded quote
        # character (the standard escape) so an adversarial/odd column
        # name can't break out of the quoting; unquoted mode only admits
        # plain identifier characters at all.
        if ident_quote:
            ob = order_by.replace(ident_quote, ident_quote * 2)
        else:
            if not order_by.replace("_", "").isalnum():
                raise ValueError(
                    f"unquoted order_by must be a plain identifier, got {order_by!r} "
                    "(pass ident_quote to quote it)"
                )
            ob = order_by
        q += f" ORDER BY {ident_quote}{ob}{ident_quote} {'DESC' if descending else 'ASC'}"
    if limit is not None:
        n = int(limit)
        q += f" LIMIT {n}" if limit_style == "limit" else f" FETCH FIRST {n} ROWS ONLY"
    return f"({q}) as tmp"


# Embedded Derby — the JDBC engine Spark itself ships (its Hive
# metastore default), so the sandbox can run a REAL database round-trip
# (live CREATE/INSERT/partitioned-SELECT through Spark's JDBC source)
# with zero extra jars. Everything below is plain public Derby/Spark
# surface; swapping url+driver for MySQL reproduces the reference's
# exact deployment (stream_consumer.py:34-40).
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str, create: bool = True) -> str:
    """Embedded-Derby JDBC URL for a database directory (created on
    first connect with ``create=True``). Runs inside the Spark JVM —
    in-process, no server — which is what makes JDBC interop testable
    in a sandbox with no network database."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_dir}{suffix}"


def quiet_derby_log(spark: SparkSession, path: str = "/tmp/derby.log") -> None:
    """Point Derby's engine log away from the process CWD (it writes
    ``derby.log`` wherever the JVM started, polluting the repo). Must
    run before the first Derby class loads in the JVM; harmless if
    Derby is already initialized or the JVM is unreachable (Connect)."""
    try:
        spark._jvm.java.lang.System.setProperty("derby.stream.error.file", path)
    except AttributeError:
        pass


def jdbc_reader(
    spark: SparkSession,
    url: str,
    dbtable: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **extra: str,
) -> DataFrameReader:
    """Configured (not yet loaded) JDBC reader. Callers do ``.load()``;
    tests inspect the option plumbing without needing a live database.

    With ``partition_column`` + bounds + ``num_partitions`` the scan
    fans out to one query per stride per executor — the difference
    between a 1-task and an N-task read of a big table."""
    extra = dict(extra)
    extra.setdefault("fetchsize", fetchsize)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs partition_column, lower_bound, "
                "upper_bound AND num_partitions"
            )
        extra.update(
            partitionColumn=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
        )
    opts = jdbc_options(url, dbtable, user, password, driver, **extra)
    return spark.read.format("jdbc").options(**opts)


def read_jdbc(spark: SparkSession, url: str, dbtable: str, user: str, password: str, **kw) -> DataFrame:
    """Load a JDBC table/derived-table as a DataFrame."""
    return jdbc_reader(spark, url, dbtable, user, password, **kw).load()


def read_jdbc_latest_k(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    ts_col: str = "timestamp",
    k: int = 10_000,
    limit_style: str | None = None,
    ident_quote: str | None = None,
    dialect: str | None = None,
    **kw,
) -> DataFrame:
    """Reference S3: last-k rows by timestamp with the top-k pushed into
    the database, re-sorted ascending Spark-side (folding the
    reference's client-side Pandas re-sort, ``batch_processor.py:114``,
    into the plan). ``dialect`` picks the quote/limit style the target
    engine speaks (see :func:`pushdown_subquery`)."""
    sub = pushdown_subquery(
        table, order_by=ts_col, descending=True, limit=k,
        limit_style=limit_style, ident_quote=ident_quote, dialect=dialect,
    )
    df = read_jdbc(spark, url, sub, user, password, **kw)
    return df.orderBy(ts_col)


def write_jdbc(
    df: DataFrame,
    url: str,
    dbtable: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    mode: str = "append",
    batchsize: int = 10_000,
    **extra: str,
) -> None:
    """Reference S2: append a DataFrame to an RDBMS table
    (``stream_consumer.py:61-69``). Executors open the connections —
    each write task INSERTs its own partition, batched by
    ``batchsize``; partition count bounds connection fan-in."""
    writer = configured_jdbc_writer(df, url, dbtable, user, password, driver, mode, batchsize, **extra)
    writer.save()


def configured_jdbc_writer(
    df: DataFrame,
    url: str,
    dbtable: str,
    user: str,
    password: str,
    driver: str = "com.mysql.cj.jdbc.Driver",
    mode: str = "append",
    batchsize: int = 10_000,
    **extra: str,
):
    """The writer ``write_jdbc`` saves — exposed so tests can verify
    the constructed options without a live database."""
    opts = jdbc_options(url, dbtable, user, password, driver, batchsize=batchsize, **extra)
    return df.write.format("jdbc").options(**opts).mode(mode)
