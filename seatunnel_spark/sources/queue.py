"""Queue-connector composition: a changelog stream of raw JSON strings
(the Kafka/Pulsar value shape) → the engine's typed event stream.

Reference: connector-kafka source + seatunnel-format-json
(DebeziumJsonDeserializationSchema.java, CanalJsonDeserializationSchema.java)
and plugin-mapping.properties' kafka→debezium/canal format wiring. Spark
already ships the broker transport (``readStream.format("kafka")``); what the
engine owns is everything after the value bytes: envelope parsing, RowKind
routing, ordering, and the handoff into the exactly-once ingest job. That
composition is this module, and it is identical for a real broker and for
the file-backed stand-in used in tests — only the first ``readStream`` line
differs:

    kafka:  spark.readStream.format("kafka")...load().selectExpr("CAST(value AS STRING) AS value")
    files:  spark.readStream.text(dir)   (column is named ``value`` too)

Ordering: the engine LWW-merges by a total ``seq``. A real debezium envelope
carries a source position (MySQL binlog ``pos``, Postgres ``lsn``); the
envelope schema here exposes it as ``source.seq`` and falls back to
``ts_ms`` when absent — the same "source offset, else event time" ordering
the reference sink dedup uses (BufferReducedBatchStatementExecutor keyed by
arrival order within a checkpoint, with the source guaranteeing per-key
order). Per-key order is all LWW needs; a global total order is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seatunnel_spark.schema import event_schema
from seatunnel_spark.sources.formats import (
    parse_canal_json,
    parse_connect_json,
    parse_debezium_json,
    parse_mongo_change_stream,
)

WIRE_FORMATS = ("debezium-json", "canal-json", "mongodb-json", "connect-json")

_PARSERS = {
    "debezium-json": parse_debezium_json,
    "canal-json": parse_canal_json,
    "mongodb-json": parse_mongo_change_stream,
    "connect-json": parse_connect_json,
}


def changelog_to_events(
    parsed: DataFrame, row_fields: list[str], keep_table: bool = False
) -> DataFrame:
    """(op, _table, ts_ms, _seq, <row fields>) → the internal event schema.

    ``seq`` comes from the parser's ``_seq`` (source offset, else ts_ms);
    ``txn_id`` mirrors seq (queue messages are their own transaction unless
    the envelope batches — canal's `data` array explodes upstream).

    DDL + evolution: a parser that emits ``_ddl`` (canal's isDdl envelopes
    carry the raw ALTER statement) passes it through as the event's ``ddl``
    payload — the ingest job resolves it via schema.parse_change. Row fields
    beyond the fixed event schema ride in the ``extra`` JSON map (the
    superset-struct strategy), so post-DDL columns flow without changing the
    stream's wire schema."""
    ev = event_schema()
    fixed = {f.name for f in ev.fields}
    cols = [
        F.col("_seq").cast("long").alias("seq"),
        F.col("_seq").cast("long").alias("txn_id"),
        F.col("op"),
    ]
    for f in ev.fields:
        if f.name in ("seq", "txn_id", "op", "ddl", "extra", "ts"):
            continue
        if f.name in row_fields:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if "_ddl" in parsed.columns:
        cols.append(F.col("_ddl").alias("ddl"))
    else:
        cols.append(F.lit(None).cast("string").alias("ddl"))
    extra_fields = [n for n in row_fields if n not in fixed]
    if extra_fields:
        cols.append(F.to_json(F.struct(*extra_fields)).alias("extra"))
    else:
        cols.append(F.lit(None).cast("string").alias("extra"))
    cols.append(F.timestamp_millis(F.col("ts_ms")).alias("ts"))
    if keep_table:
        # multi-table streams: the envelope's source table id rides along so
        # MultiTableRouter can fan the batch out (MultipleRowType surface)
        cols.append(F.col("_table"))
    return parsed.select(*cols)


def read_changelog_stream(
    spark: SparkSession,
    source_dir: str,
    wire_format: str,
    row_schema: T.StructType,
    max_files_per_trigger: int = 2,
    keep_table: bool = False,
    broker: dict | None = None,
) -> DataFrame:
    """Changelog stream → typed event stream. Default transport is the
    file-backed stand-in (text files of one JSON envelope per line — exactly
    a Kafka topic's value column). Passing ``broker`` swaps the first
    readStream line for a real Kafka topic via the tested option seam
    (sources/kafka.py)::

        broker = {"bootstrap_servers": "b:9092", "topic": "cdc.repos",
                  "start_mode": "timestamp", "start_timestamp_ms": ...}

    Everything downstream — envelope parsing, RowKind routing, ordering,
    DDL routing — is identical on both transports. ``broker["transport"]``
    selects the queue family: ``kafka`` (default) or ``pulsar`` (the
    StreamNative pulsar-spark connector, sources/pulsar.py);
    ``rocketmq`` has no Spark Structured Streaming connector — its seam
    (sources/rocketmq.py) renders the consumer config for a relay bridge
    and this function refuses it loudly rather than pretending."""
    if wire_format not in WIRE_FORMATS:
        raise ValueError(f"unknown wire_format {wire_format!r}; use one of {WIRE_FORMATS}")
    if broker is not None:
        transport = broker.get("transport", "kafka")
        passthrough = {k: v for k, v in broker.items()
                       if k not in ("max_offsets_per_trigger", "transport")}
        if transport == "kafka":
            from seatunnel_spark.sources.kafka import (
                kafka_read_options,
                kafka_value_stream,
            )

            opts = kafka_read_options(**passthrough)
            raw = kafka_value_stream(
                spark, opts,
                max_offsets_per_trigger=broker.get("max_offsets_per_trigger"),
            )
        elif transport == "pulsar":
            from seatunnel_spark.sources.pulsar import (
                pulsar_read_options,
                pulsar_value_stream,
            )

            raw = pulsar_value_stream(spark, pulsar_read_options(**passthrough))
        elif transport in ("rocketmq", "rabbitmq"):
            raise ValueError(
                f"{transport} has no Spark Structured Streaming transport; "
                f"use seatunnel_spark.sources.{transport}'s option generator "
                "to configure a relay into a topic dir / Kafka topic and "
                "stream that instead"
            )
        else:
            raise ValueError(f"unknown broker transport {transport!r}")
    else:
        raw = (
            spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
            .text(source_dir)
        )
    parsed = _PARSERS[wire_format](raw, row_schema)
    return changelog_to_events(
        parsed, [f.name for f in row_schema.fields], keep_table=keep_table
    )


def read_changelog_batch(
    spark: SparkSession,
    source_dir: str,
    wire_format: str,
    row_schema: T.StructType,
    keep_table: bool = False,
) -> DataFrame:
    """Bounded (batch) read of the same file-backed changelog — used for
    offset resolution (StartupMode/StopMode TIMESTAMP): one scan of the log
    with the timestamp predicate, never a streaming trigger. On a real
    broker this job is the broker's timestamp index (Kafka
    ``offsetsForTimes``); the file-backed stand-in ts-filters the parsed
    stream instead — same contract, engine-side."""
    if wire_format not in WIRE_FORMATS:
        raise ValueError(f"unknown wire_format {wire_format!r}; use one of {WIRE_FORMATS}")
    raw = spark.read.text(source_dir)
    parsed = _PARSERS[wire_format](raw, row_schema)
    return changelog_to_events(
        parsed, [f.name for f in row_schema.fields], keep_table=keep_table
    )
