"""Kafka-source CDC plane (reference St1 + St4, SURVEY §2.8).

The reference's change stream IS Kafka: Debezium publishes one topic per
table named ``<prefix>.<database>.<schema>.<table>`` with Avro-encoded
envelopes and tombstones on delete
(docker/configs/debezium/sqlserver-source.json:28,37,46-48), and the sink
side unwraps + routes topics to tables with a RegexRouter capturing the
last segment (docker/configs/kafka-connect/postgresql-sink.json:55-58).

Spark mapping, split the same way the JDBC source is (builders + an
executable core), because the ``spark-sql-kafka`` connector jar is a
deploy-time dependency:

- :func:`kafka_reader_options` / :func:`read_kafka_stream` — the exact
  reader configuration production uses (testable as data; the ``.load()``
  needs the connector on the classpath).
- :func:`parse_changes` — Kafka record batch -> envelope rows. This is
  the part with real semantics (tombstone handling, JSON/Avro decode,
  topic->table routing) and it is plain DataFrame code, so the tests
  drive it with Kafka-shaped batches and the streaming path reuses it
  verbatim (Structured Streaming plans the same operators).
- :class:`DemuxUpsertSink` — St4: one stream carrying many tables fanned
  out to per-table idempotent upserts inside a single ``foreachBatch``.
- :class:`KafkaCdcPipeline` — the composed readStream -> parse ->
  unwrap -> soft-delete -> demux-upsert query.

Scale posture: parsing and routing are per-record projections (no
shuffle); the only shuffle is the per-table merge's PK window, and the
demux filter fans out from one cached batch, so a 1000-partition topic
set flows through without a driver bottleneck (the distinct-topic
collect is bounded by the table count, not the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlserver_pg_cdc_spark.streaming.apply import (
    ParquetUpsertSink,
    unwrap_envelope,
    with_soft_delete,
    with_stale_flag,
)
from sqlserver_pg_cdc_spark.streaming.pipeline import change_stream_schema

# what spark-sql-kafka's source emits per record; tests synthesize
# batches with this exact shape
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),  # null = tombstone
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)

# RegexRouter parity: capture the last dot-segment of the topic name
# (postgresql-sink.json:57 "sqlserver\\.warehouse_source\\.dbo\\.(.*)")
DEFAULT_TABLE_REGEX = r"([^.]+)$"


def kafka_reader_options(
    bootstrap_servers: str,
    subscribe_pattern: str | None = None,
    topics: list[str] | None = None,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Reader options mirroring the reference's consumption contract:
    one consumer over all per-table topics (sqlserver-source.json:28
    topic.prefix + table.include.list), resumable from the checkpoint.

    ``failOnDataLoss=false`` because Debezium topics are compacted —
    offsets can disappear between restarts without data loss.
    """
    if (subscribe_pattern is None) == (topics is None):
        raise ValueError("exactly one of subscribe_pattern / topics is required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
        # Debezium headers/keys are decoded separately; include headers
        # so transaction metadata (provide.transaction.metadata=true)
        # stays available downstream
        "includeHeaders": "true",
    }
    if subscribe_pattern is not None:
        opts["subscribePattern"] = subscribe_pattern
    else:
        opts["subscribe"] = ",".join(topics)
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(spark: SparkSession, **reader_kwargs) -> DataFrame:
    """``readStream.format("kafka")`` with the options above. Needs
    org.apache.spark:spark-sql-kafka-0-10 on the classpath (deploy-time;
    not bundled with pip pyspark, so local tests drive parse_changes
    with synthesized batches instead)."""
    opts = kafka_reader_options(**reader_kwargs)
    return spark.readStream.format("kafka").options(**opts).load()


def topic_table(topic_col: str = "topic", regex: str = DEFAULT_TABLE_REGEX) -> F.Column:
    """St4 routing key: table name extracted from the topic (RegexRouter
    parity, postgresql-sink.json:56-58)."""
    return F.regexp_extract(F.col(topic_col), regex, 1)


def parse_changes(
    records: DataFrame,
    payload_schema: T.StructType,
    value_format: str = "json",
    avro_schema: str | None = None,
    drop_tombstones: bool = True,
    table_regex: str = DEFAULT_TABLE_REGEX,
) -> DataFrame:
    """Kafka records -> Debezium envelope rows + ``__table`` routing col.

    - Tombstones (null value) are dropped by default
      (postgresql-sink.json:53 drop.tombstones=true); pass False to keep
      them for compaction-aware sinks.
    - ``json``: envelope parsed with the typed schema (malformed values
      yield a null envelope -> routed to DLQ by the sink, St10).
    - ``avro``: reference wire format (sqlserver-source.json:46-48);
      needs the spark-avro module at runtime, so the import is gated.
    """
    if drop_tombstones:
        records = records.filter(F.col("value").isNotNull())
    env_schema = change_stream_schema(payload_schema)
    if value_format == "json":
        env = F.from_json(F.col("value").cast("string"), env_schema)
    elif value_format == "avro":
        if avro_schema is None:
            raise ValueError("avro_schema (JSON string) is required for avro format")
        try:
            from pyspark.sql.avro.functions import from_avro
        except ImportError as e:  # pragma: no cover - depends on deploy env
            raise RuntimeError(
                "avro decode needs the org.apache.spark:spark-avro package "
                "on the Spark classpath"
            ) from e
        env = from_avro(F.col("value"), avro_schema)
    else:
        raise ValueError(f"unknown value_format: {value_format!r}")
    return records.select(
        env.alias("__env"),
        topic_table("topic", table_regex).alias("__table"),
        F.col("offset").alias("__kafka_offset"),
    ).select("__env.*", "__table", "__kafka_offset")


class DemuxUpsertSink:
    """St4: route one multi-table change stream to per-table upsert sinks
    inside a single foreachBatch (the Spark twin of RegexRouter + one JDBC
    sink connector per topic).

    The batch is persisted once; the distinct-table collect is bounded by
    the number of tables (reference: 5, postgresql-sink.json:22), and each
    table's slice goes through the same LSN-guarded merge_upsert as the
    single-table sink — so at-least-once replay stays idempotent per
    table.
    """

    def __init__(
        self,
        spark: SparkSession,
        target_root: str,
        pk_cols: dict[str, list[str]],
        lsn_col: str = "lsn",
        dlq_dir: str | None = None,
        table_col: str = "__table",
    ):
        self.spark = spark
        self.target_root = target_root
        self.pk_cols = pk_cols
        self.lsn_col = lsn_col
        self.dlq_dir = dlq_dir
        self.table_col = table_col

    def sink_for(self, table: str) -> ParquetUpsertSink:
        if table not in self.pk_cols:
            raise KeyError(f"no pk mapping for routed table {table!r}")
        return ParquetUpsertSink(
            self.spark,
            f"{self.target_root}/{table}",
            self.pk_cols[table],
            lsn_col=self.lsn_col,
            dlq_dir=f"{self.dlq_dir}/{table}" if self.dlq_dir else None,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            tables = [
                r[0]
                for r in batch_df.select(self.table_col).distinct().collect()
            ]
            for table in tables:
                slice_df = batch_df.filter(
                    F.col(self.table_col) == table
                ).drop(self.table_col)
                if table not in self.pk_cols:
                    # errors.tolerance=all parity: an unrouted topic must
                    # not kill the stream — quarantine its rows instead
                    # (postgresql-sink.json:46-48 DLQ routing)
                    if self.dlq_dir is None:
                        raise KeyError(f"no pk mapping for routed table {table!r}")
                    (
                        slice_df.withColumn("__error_class", F.lit("UnroutedTable"))
                        .withColumn(
                            "__error_message",
                            F.lit(f"no pk mapping for routed table {table!r}"),
                        )
                        .withColumn("__batch_id", F.lit(batch_id))
                        .write.mode("append")
                        .parquet(f"{self.dlq_dir}/__unrouted_{table}")
                    )
                    continue
                self.sink_for(table)(slice_df, batch_id)
        finally:
            batch_df.unpersist()


class KafkaCdcPipeline:
    """Kafka -> parse -> unwrap -> soft-delete -> stale-flag -> demux
    upsert, checkpointed (St6). The transform chain is identical to the
    file-spool pipeline's — only the source and the routing differ."""

    def __init__(
        self,
        spark: SparkSession,
        bootstrap_servers: str,
        subscribe_pattern: str,
        target_root: str,
        checkpoint_dir: str,
        payload_schema: T.StructType,
        pk_cols: dict[str, list[str]],
        value_format: str = "json",
        avro_schema: str | None = None,
        dlq_dir: str | None = None,
        stale_hours: int = 24,
        max_offsets_per_trigger: int | None = None,
    ):
        self.spark = spark
        self.bootstrap_servers = bootstrap_servers
        self.subscribe_pattern = subscribe_pattern
        self.target_root = target_root
        self.checkpoint_dir = checkpoint_dir
        self.payload_schema = payload_schema
        self.pk_cols = pk_cols
        self.value_format = value_format
        self.avro_schema = avro_schema
        self.dlq_dir = dlq_dir
        self.stale_hours = stale_hours
        self.max_offsets_per_trigger = max_offsets_per_trigger

    def transform(self, records: DataFrame) -> DataFrame:
        """The full record->row chain; shared by stream and tests."""
        env = parse_changes(
            records,
            self.payload_schema,
            value_format=self.value_format,
            avro_schema=self.avro_schema,
        )
        # unwrap operates on the envelope columns; carry routing through
        flat = unwrap_envelope(env.drop("__kafka_offset"), keep_cols=("__table",))
        flat = with_soft_delete(flat)
        return with_stale_flag(flat, max_age_hours=self.stale_hours)

    def sink(self) -> DemuxUpsertSink:
        return DemuxUpsertSink(
            self.spark,
            self.target_root,
            self.pk_cols,
            dlq_dir=self.dlq_dir,
        )

    def run_available_now(self) -> None:  # pragma: no cover - needs broker
        records = read_kafka_stream(
            self.spark,
            bootstrap_servers=self.bootstrap_servers,
            subscribe_pattern=self.subscribe_pattern,
            max_offsets_per_trigger=self.max_offsets_per_trigger,
        )
        q = (
            self.transform(records)
            .writeStream.foreachBatch(self.sink())
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
