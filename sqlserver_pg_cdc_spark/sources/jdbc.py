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


def _null_safe_key_cond(left: str, right: str, pk_cols: list[str]) -> str:
    return " AND ".join(
        f"{left}.{c} IS NOT DISTINCT FROM {right}.{c}" for c in pk_cols
    )


class _PartitionScd2Writer:
    """Executor-side SCD2 apply: ONE connection, ONE transaction for the
    whole batch (the sink coalesces to a single partition) — close the
    current version + insert the new ones atomically, so a reader at the
    database never observes a half-applied batch. Must stay picklable."""

    def __init__(self, connection_factory, table: str, biz_cols: list[str],
                 pk_cols: list[str], batch_size: int, open_lsn: int):
        self.connection_factory = connection_factory
        self.table = table
        self.biz_cols = biz_cols
        self.pk_cols = pk_cols
        self.batch_size = batch_size
        self.open_lsn = open_lsn

    def __call__(self, rows) -> None:
        t = self.table
        biz = ", ".join(self.biz_cols)
        key_hb = _null_safe_key_cond("h", "b", self.pk_cols)
        key_tb = _null_safe_key_cond(t, "b", self.pk_cols)
        key_tn = _null_safe_key_cond(t, "n", self.pk_cols)
        keys = ", ".join(self.pk_cols)
        cols = self.biz_cols + ["__lsn", "__is_delete"]
        placeholders = ", ".join(["?"] * len(cols))
        con = self.connection_factory()
        try:
            con.execute("BEGIN TRANSACTION")
            # batch spool: a session-temp table keeps every later step
            # set-based (and parameterized — no values ever rendered
            # into SQL text)
            con.execute(
                f"CREATE TEMPORARY TABLE __scd2_batch AS "
                f"SELECT {biz}, __lsn, __is_delete FROM {t} LIMIT 0"
            )
            ins = (
                f"INSERT INTO __scd2_batch ({', '.join(cols)}) "
                f"VALUES ({placeholders})"
            )
            buf = []
            n_rows = 0
            for row in rows:
                buf.append(tuple(row[c] for c in cols))
                n_rows += 1
                if len(buf) >= self.batch_size:
                    con.executemany(ins, buf)
                    buf.clear()
            if buf:
                con.executemany(ins, buf)
            if n_rows == 0:
                con.execute("COMMIT")
                return
            # replay-idempotent version insert: a (key, lsn) already in
            # the history is skipped BEFORE any interval surgery; the
            # row_number dedupes within-batch duplicates the transport
            # may re-deliver. Validity is provisional (open) — the
            # recompute below fixes every affected chain.
            con.execute(
                f"INSERT INTO {t} ({biz}, __lsn, __is_delete, "
                f"__valid_from_lsn, __valid_to_lsn, __active) "
                f"SELECT {biz}, __lsn, __is_delete, __lsn, "
                f"{self.open_lsn}, FALSE FROM ("
                f"  SELECT *, row_number() OVER ("
                f"    PARTITION BY {keys}, __lsn ORDER BY __lsn) AS __rn"
                f"  FROM __scd2_batch) b "
                f"WHERE __rn = 1 AND NOT EXISTS ("
                f"  SELECT 1 FROM {t} h WHERE {key_hb} AND h.__lsn = b.__lsn)"
            )
            # validity-chain recompute for AFFECTED keys only (the keys
            # present in the batch): each version closes at the next
            # version's LSN; the last stays open and is active unless it
            # is a delete tombstone. Handles out-of-order LSN arrivals
            # by construction — the chain is rebuilt from the stored
            # set, not patched incrementally.
            con.execute(
                f"UPDATE {t} SET "
                f"  __valid_to_lsn = n.__next_lsn, "
                f"  __active = (n.__next_lsn = {self.open_lsn} "
                f"              AND NOT {t}.__is_delete) "
                f"FROM ("
                f"  SELECT {keys}, __lsn, COALESCE("
                f"    LEAD(__lsn) OVER (PARTITION BY {keys} ORDER BY __lsn), "
                f"    {self.open_lsn}) AS __next_lsn "
                f"  FROM {t} "
                f"  WHERE EXISTS (SELECT 1 FROM __scd2_batch b WHERE {key_tb})"
                f") n "
                f"WHERE {key_tn} AND {t}.__lsn = n.__lsn"
            )
            con.execute("DROP TABLE __scd2_batch")
            con.execute("COMMIT")
        except Exception:
            try:
                con.execute("ROLLBACK")
            except Exception:
                pass
            raise
        finally:
            con.close()


class DbApiScd2Sink:
    """Executed-target SCD2 history apply (round-7 verdict #8): the
    versioned-dimension twin of :class:`DbApiUpsertSink`, writing to a
    live DBAPI database (PostgreSQL in the reference deployment —
    postgresql-sink.json:23-34 is the sink plane; DuckDB in tests, same
    statement shapes).

    Semantics match `streaming/scd2.scd2_apply` exactly (the parquet
    history sink's contract): every change event becomes a version row
    with a validity interval; a new version closes its predecessor; a
    delete closes the chain without an active successor; replays are
    idempotent by (key, LSN); out-of-order LSNs converge because the
    affected chains are RECOMPUTED set-based (one windowed UPDATE), not
    patched. The whole batch applies in ONE transaction — close current
    version + insert new versions atomically.

    The history table must exist with columns: the business columns plus
    ``__lsn BIGINT, __is_delete BOOLEAN, __valid_from_lsn BIGINT,
    __valid_to_lsn BIGINT, __active BOOLEAN``.
    """

    def __init__(
        self,
        connection_factory,
        table: str,
        pk_cols: list[str],
        lsn_col: str = "lsn",
        op_col: str = "op",
        delete_op: str = "d",
        batch_size: int = 3000,
    ):
        _safe_ident(table)
        for c in pk_cols:
            _safe_ident(c)
        self.connection_factory = connection_factory
        self.table = table
        self.pk_cols = pk_cols
        self.lsn_col = lsn_col
        self.op_col = op_col
        self.delete_op = delete_op
        self.batch_size = batch_size

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        biz = [
            c for c in batch_df.columns
            if c not in (self.lsn_col, self.op_col)
        ]
        for c in biz:
            _safe_ident(c)
        versions = batch_df.select(
            *[F.col(c) for c in biz],
            F.col(self.lsn_col).cast("long").alias("__lsn"),
            (F.col(self.op_col) == self.delete_op).alias("__is_delete"),
        )
        writer = _PartitionScd2Writer(
            self.connection_factory, self.table, biz, self.pk_cols,
            self.batch_size, self._open_lsn(),
        )
        # one partition -> one connection -> one transaction per batch
        versions.coalesce(1).foreachPartition(writer)

    @staticmethod
    def _open_lsn() -> int:
        from sqlserver_pg_cdc_spark.streaming.scd2 import OPEN_LSN

        return OPEN_LSN
