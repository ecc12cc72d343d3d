"""JDBC sources & sinks (reference S9-S11).

The reference's connection pools (db_pool/base.py:125-565) vanish here:
Spark's JDBC datasource manages connections per partition. What remains
user-visible is *partitioned read planning* — the replacement for the
reference's OFFSET pagination (S3) — and the upsert sink semantics.

No database exists in this test environment, so these builders are
exercised up to the option dict and the SQL they generate; the
``read``/``write`` calls themselves are thin Spark API pass-throughs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    url: str  # jdbc:postgresql://... / jdbc:sqlserver://...
    user: str
    password: str
    driver: str | None = None
    extra: dict[str, str] = field(default_factory=dict)

    def properties(self) -> dict[str, str]:
        props = {"user": self.user, "password": self.password, **self.extra}
        if self.driver:
            props["driver"] = self.driver
        return props


def partitioned_read_options(
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Partitioned JDBC scan options — N concurrent range queries instead
    of the reference's serial LIMIT/OFFSET chunking (compare/checksum.py:
    144-276). Bounds come from ``SELECT min(pk), max(pk)`` or catalog
    stats; each executor reads one range."""
    return {
        "dbtable": table,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    bounds: tuple[int, int] | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", cfg.url)
    for k, v in cfg.properties().items():
        reader = reader.option(k, v)
    if partition_column and bounds:
        for k, v in partitioned_read_options(
            table, partition_column, bounds[0], bounds[1], num_partitions
        ).items():
            reader = reader.option(k, v)
    else:
        reader = reader.option("dbtable", table)
    return reader.load()


import re as _re

# CDC identifiers include $ (SQL Server __$start_lsn) and dotted
# schema-qualification (cdc.table_CT)
_CDC_IDENT = _re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)*$")


def _safe_ident(name: str) -> str:
    if not _CDC_IDENT.match(name or ""):
        raise ValueError(f"invalid identifier for generated SQL: {name!r}")
    return name


def incremental_poll_query(
    table: str,
    lsn_column: str,
    last_lsn: str | int,
    order_columns: list[str] | None = None,
    limit: int | None = 2048,
    dialect: str = "sqlserver",
) -> str:
    """The Debezium-poll analog as SQL (reference data-model.md:366-371:
    ``WHERE __$start_lsn > ? ORDER BY __$start_lsn, __$seqval``) — used by
    a driver loop that feeds micro-batches into the CDC apply path when no
    Kafka is present (BASELINE.json's stated Spark approach).

    Identifiers are validated (letters/digits/_/$ with optional schema
    qualification) and string LSNs are quote-escaped — this SQL goes to a
    live database."""
    _safe_ident(table)
    _safe_ident(lsn_column)
    order = ", ".join(_safe_ident(c) for c in (order_columns or [lsn_column]))
    if isinstance(last_lsn, str):
        lsn_lit = "'" + last_lsn.replace("'", "''") + "'"
    else:
        lsn_lit = str(int(last_lsn))
    # the primary target is SQL Server CT tables, which take TOP, not LIMIT
    top = f"TOP {int(limit)} " if limit and dialect == "sqlserver" else ""
    q = f"SELECT {top}* FROM {table} WHERE {lsn_column} > {lsn_lit} ORDER BY {order}"
    if limit and dialect != "sqlserver":
        q += f" LIMIT {int(limit)}"
    return q


def upsert_write_options(table: str, pk_cols: list[str], batch_size: int = 3000) -> dict:
    """Sink-side shape of the reference's JDBC upsert connector
    (postgresql-sink.json:23-34). Spark's own JDBC writer has no upsert
    mode; production deployments route foreachBatch through a MERGE/
    INSERT..ON CONFLICT statement built from these options."""
    return {
        "dbtable": table,
        "insert.mode": "upsert",
        "pk.fields": ",".join(pk_cols),
        "batchsize": str(batch_size),
    }


def on_conflict_upsert_sql(
    table: str,
    columns: list[str],
    pk_cols: list[str],
    placeholder: str = "%s",
    lsn_guard_col: str | None = None,
) -> str:
    """INSERT ... ON CONFLICT DO UPDATE for the foreachBatch sink path
    (the reference sink's upsert semantics, FR-005). ``placeholder`` is
    the DBAPI paramstyle (``%s`` psycopg, ``?`` duckdb/sqlite/jdbc).

    With ``lsn_guard_col`` the update applies only when the incoming LSN
    is >= the stored one — the cross-batch idempotence guard pushed INTO
    the database, so at-least-once replays and out-of-order partitions
    converge without read-modify-write races."""
    _safe_ident(table)
    for c in columns:
        _safe_ident(c)
    collist = ", ".join(columns)
    placeholders = ", ".join([placeholder] * len(columns))
    updates = ", ".join(
        f"{c} = EXCLUDED.{c}" for c in columns if c not in pk_cols
    )
    conflict = ", ".join(pk_cols)
    sql = (
        f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
        f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
    )
    if lsn_guard_col is not None:
        _safe_ident(lsn_guard_col)
        sql += f" WHERE {table}.{lsn_guard_col} <= EXCLUDED.{lsn_guard_col}"
    return sql


class _PartitionUpsertWriter:
    """Executor-side writer: one DBAPI connection per partition, chunked
    executemany (reference batch.size=3000, postgresql-sink.json:32).
    Must stay picklable — it ships to executors."""

    def __init__(self, connection_factory, sql: str, columns: list[str], batch_size: int):
        self.connection_factory = connection_factory
        self.sql = sql
        self.columns = columns
        self.batch_size = batch_size

    def __call__(self, rows) -> None:
        con = self.connection_factory()
        try:
            buf = []
            for row in rows:
                buf.append(tuple(row[c] for c in self.columns))
                if len(buf) >= self.batch_size:
                    con.executemany(self.sql, buf)
                    buf.clear()
            if buf:
                con.executemany(self.sql, buf)
            try:
                con.commit()
            except Exception:
                pass  # autocommit DBAPIs (duckdb) have no explicit commit
        finally:
            con.close()


class DbApiUpsertSink:
    """S11 executed: foreachBatch sink running the ON CONFLICT upsert
    against a live DBAPI target (PostgreSQL in the reference deployment,
    DuckDB/SQLite in tests — same statement shape).

    Semantics match ParquetUpsertSink: within-batch dedup to the latest
    LSN per key, then a per-row upsert whose LSN guard lives in the SQL,
    so replays are no-ops at the database. Writes happen executor-side
    via foreachPartition — nothing is collected to the driver, and a
    1000-partition batch opens 1000 pooled connections in parallel
    exactly like the reference's JDBC sink tasks. ``parallel=False``
    coalesces to one partition for single-writer embedded targets
    (DuckDB file, SQLite); leave True for PostgreSQL.
    """

    def __init__(
        self,
        connection_factory,
        table: str,
        pk_cols: list[str],
        lsn_col: str = "lsn",
        batch_size: int = 3000,
        placeholder: str = "?",
        parallel: bool = True,
    ):
        self.connection_factory = connection_factory
        self.table = table
        self.pk_cols = pk_cols
        self.lsn_col = lsn_col
        self.batch_size = batch_size
        self.placeholder = placeholder
        self.parallel = parallel

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.streaming.apply import latest_per_key

        deduped = latest_per_key(batch_df, self.pk_cols, self.lsn_col)
        columns = deduped.columns
        sql = on_conflict_upsert_sql(
            self.table,
            columns,
            self.pk_cols,
            placeholder=self.placeholder,
            lsn_guard_col=self.lsn_col,
        )
        writer = _PartitionUpsertWriter(
            self.connection_factory, sql, columns, self.batch_size
        )
        target = deduped if self.parallel else deduped.coalesce(1)
        target.foreachPartition(writer)
