"""Wire formats: debezium-json and canal-json → changelog columns.

Reference: seatunnel-formats/seatunnel-format-json/.../debezium/
DebeziumJsonDeserializationSchema.java and canal/CanalJsonDeserializationSchema.java
— SeaTunnel's compatibility parsers for the two most common CDC wire formats.
Here each is a single JVM-side ``from_json`` + projection (codegen, no UDF):
the stream arrives as raw JSON strings (e.g. a Kafka value column) and leaves
as our typed changelog shape (op I/U/D + after/before images), ready for
``project_to_table_schema`` → MERGE.

Op mapping:
- debezium: c/r → I (READ/snapshot rows are inserts, reference
  SeaTunnelRowDebeziumDeserializeSchema.java:159-198), u → U (after image;
  UPDATE_BEFORE is not materialized since MERGE is keyed), d → D (before image)
- canal: INSERT → I, UPDATE → U, DELETE → D (canal batches rows in `data`)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def debezium_envelope_schema(row_schema: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("table", T.StringType(), True),
                        T.StructField("db", T.StringType(), True),
                        # source log position (MySQL binlog pos / PG lsn) —
                        # the per-key ordering key; ts_ms is the fallback
                        T.StructField("seq", T.LongType(), True),
                        # native MySQL binlog coordinates (debezium source
                        # block fields `file`/`pos`) — consumed by the
                        # SPECIFIC_OFFSET startup resolver
                        # (offsets.resolve_binlog_start_seq); absent
                        # envelopes parse them as null
                        T.StructField("file", T.StringType(), True),
                        T.StructField("pos", T.LongType(), True),
                    ]
                ),
                True,
            ),
            # Debezium SCHEMA-CHANGE envelope (history topic, or the data
            # topic with include.schema.changes=true): the raw DDL statement
            # plus the structured tableChanges array. Data-change envelopes
            # leave both null. Reference: SchemaChangeResolver.java:27-32 and
            # seatunnel-format-compatible-debezium-json.
            T.StructField("ddl", T.StringType(), True),
            T.StructField(
                "tableChanges",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("type", T.StringType(), True),
                            T.StructField("id", T.StringType(), True),
                        ]
                    )
                ),
                True,
            ),
            # older Debezium spelling: the history record rides as an escaped
            # JSON string whose payload carries the same ddl field
            T.StructField("historyRecord", T.StringType(), True),
        ]
    )


_HISTORY_DDL_SCHEMA = T.StructType([T.StructField("ddl", T.StringType(), True)])


def parse_debezium_json(
    df: DataFrame, row_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Raw debezium JSON strings → (op, _table, ts_ms, <row fields>).
    DELETE takes the before image; everything else the after image.

    Schema-change envelopes (a top-level ``ddl`` field, or the legacy
    ``historyRecord`` JSON string wrapping one) become op='DDL' rows whose
    ``_ddl`` column carries the raw ALTER statement — the same routing the
    canal parser does for ``isDdl`` envelopes, so MySQL DDL flows through
    schema.parse_change → lake evolution on the debezium wire format too.
    The table id prefers ``source.table`` and falls back to the first
    ``tableChanges[].id`` (history-topic events may omit ``source.table``),
    unquoting the `"db"."tbl"` spelling and keeping the last dotted part."""
    env = F.from_json(F.col(value_col), debezium_envelope_schema(row_schema))
    hist_ddl = F.from_json(env["historyRecord"], _HISTORY_DDL_SCHEMA)["ddl"]
    ddl = F.coalesce(env["ddl"], hist_ddl)
    is_ddl = ddl.isNotNull()
    op = (
        F.when(is_ddl, "DDL")
        .when(env["op"].isin("c", "r"), "I")
        .when(env["op"] == "u", "U")
        .when(env["op"] == "d", "D")
    )
    image = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    tc_table = F.element_at(
        F.split(F.regexp_replace(env["tableChanges"][0]["id"], '"', ""), r"\."), -1
    )
    out = df.select(
        op.alias("op"),
        F.coalesce(env["source"]["table"], tc_table).alias("_table"),
        env["ts_ms"].alias("ts_ms"),
        F.coalesce(env["source"]["seq"], env["ts_ms"]).alias("_seq"),
        F.when(is_ddl, ddl).alias("_ddl"),
        image.alias("_row"),
    )
    return out.select("op", "_table", "ts_ms", "_seq", "_ddl", "_row.*")


def parse_debezium_with_position(
    df: DataFrame, row_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Like ``parse_debezium_json`` but keeps the native binlog coordinates
    as ``_file``/``_pos`` columns (debezium's ``source.file``/``source.pos``
    — the MySQL BinlogOffset keys, BinlogOffset.java:42-43). Used by the
    SPECIFIC_OFFSET startup/stop resolve: one bounded parse of the topic,
    two narrow columns, one min() aggregate — no extra state on the
    streaming path itself, which stays on the seq scale."""
    env = F.from_json(F.col(value_col), debezium_envelope_schema(row_schema))
    return df.select(
        F.coalesce(env["source"]["seq"], env["ts_ms"]).alias("_seq"),
        env["source"]["file"].alias("_file"),
        env["source"]["pos"].alias("_pos"),
    )


def mongo_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """MongoDB change-stream event shape (reference connector-cdc-mongodb).
    ``clusterTime`` is a BSON Timestamp — extended JSON renders it as
    ``{"$timestamp": {"t": <seconds>, "i": <ordinal>}}``; (t, i) is the
    oplog's own total order within a second, so it is the ordering key."""
    return T.StructType(
        [
            T.StructField("operationType", T.StringType(), True),
            T.StructField("fullDocument", row_schema, True),
            T.StructField("documentKey", row_schema, True),
            T.StructField(
                "ns",
                T.StructType(
                    [
                        T.StructField("db", T.StringType(), True),
                        T.StructField("coll", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField(
                "clusterTime",
                T.StructType(
                    [
                        T.StructField(
                            "$timestamp",
                            T.StructType(
                                [
                                    T.StructField("t", T.LongType(), True),
                                    T.StructField("i", T.LongType(), True),
                                ]
                            ),
                            True,
                        )
                    ]
                ),
                True,
            ),
        ]
    )


def parse_mongo_change_stream(
    df: DataFrame, row_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Raw MongoDB change-stream JSON → (op, _table, ts_ms, _seq, <row>).
    insert/replace → I, update → U (fullDocument post-image — the reference
    requires fullDocument=updateLookup for exactly this), delete → D with
    the documentKey image (deletes carry no fullDocument)."""
    env = F.from_json(F.col(value_col), mongo_envelope_schema(row_schema))
    op = (
        F.when(env["operationType"].isin("insert", "replace"), "I")
        .when(env["operationType"] == "update", "U")
        .when(env["operationType"] == "delete", "D")
    )
    image = F.when(env["operationType"] == "delete", env["documentKey"]).otherwise(
        env["fullDocument"]
    )
    # BSON Timestamp: t is SECONDS, i disambiguates within the second —
    # ts_ms = t*1000 for event time; _seq = t*10^6 + i preserves the oplog's
    # total order (i is bounded well below 10^6 per second in practice)
    t = env["clusterTime"]["$timestamp"]["t"]
    i = F.coalesce(env["clusterTime"]["$timestamp"]["i"], F.lit(0))
    out = df.select(
        op.alias("op"),
        env["ns"]["coll"].alias("_table"),
        (t * 1000).alias("ts_ms"),
        (t * 1000000 + i).alias("_seq"),
        image.alias("_row"),
    )
    return out.select("op", "_table", "ts_ms", "_seq", "_row.*")


def canal_envelope_schema(row_schema: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("data", T.ArrayType(row_schema), True),
            T.StructField("old", T.ArrayType(row_schema), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),
            # canal's monotonic batch id — disambiguates envelopes that share
            # a millisecond tick so _seq stays a total order
            T.StructField("id", T.LongType(), True),
            # canal marks DDL events with isDdl=true and carries the raw
            # ALTER statement in `sql` — schema.parse_alter_sql resolves it
            T.StructField("isDdl", T.BooleanType(), True),
            T.StructField("sql", T.StringType(), True),
        ]
    )


def parse_canal_json(
    df: DataFrame, row_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Raw canal JSON strings → one output row per element of `data`;
    isDdl envelopes become op='DDL' rows whose ``_ddl`` carries the raw
    ALTER statement (resolved later by schema.parse_alter_sql — DDL events
    are rare and handled driver-side, so no Python touches the hot path)."""
    env = F.from_json(F.col(value_col), canal_envelope_schema(row_schema))
    is_ddl = F.coalesce(env["isDdl"], F.lit(False))
    op = (
        F.when(is_ddl, "DDL")
        .when(env["type"] == "INSERT", "I")
        .when(env["type"] == "UPDATE", "U")
        .when(env["type"] == "DELETE", "D")
    )
    # _seq must be a total order: the reference applies canal records in
    # arrival order, but `ts` alone ties for same-key updates inside one
    # millisecond, making lww_reduce's hash tie-break pick nondeterministically.
    # Fold arrival order into the low bits (the mongo parser's clusterTime.i
    # trick): ts gets 22 low bits — 12 for the batch id (canal's monotonic
    # envelope counter) and 10 for the row's index in `data`. Wrap-around
    # needs >4096 envelopes or >1024 rows-per-envelope inside a single
    # millisecond to produce a tie — beyond any real canal deployment.
    # Layout: _seq = ts_ms<<22 | (id%4096)<<10 | row_idx%1024. ts_ms must
    # stay below 2^41 (epoch ms until year ~2039) or the shift overflows
    # int64 — enforced loudly below instead of silently wrapping LWW order;
    # a canal feed past 2039 (or a mis-wired seq-as-ts producer) raises.
    ts_checked = F.when(
        env["ts"].isNull() | (env["ts"] < F.lit(1 << 41)), env["ts"]
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("canal ts overflows the 22-bit _seq shift (>= 2^41 ms): "),
                env["ts"].cast("string"),
            )
        )
    )
    out = df.select(
        op.alias("op"),
        env["table"].alias("_table"),
        env["ts"].alias("ts_ms"),
        (
            F.shiftleft(ts_checked, 22)
            + F.shiftleft(F.coalesce(env["id"], F.lit(0)) % 4096, 10)
        ).alias("_seq0"),
        F.when(is_ddl, env["sql"]).alias("_ddl"),
        F.posexplode_outer(env["data"]).alias("_idx", "_row"),
    ).where((F.col("op") == "DDL") | F.col("_row").isNotNull())
    out = out.select(
        "op",
        "_table",
        "ts_ms",
        (F.col("_seq0") + F.coalesce(F.col("_idx"), F.lit(0)) % 1024).alias("_seq"),
        "_ddl",
        "_row.*",
    )
    return out


def connect_envelope_schemas(row_schema: T.StructType) -> tuple[T.StructType, T.StructType]:
    """Kafka Connect JSON wraps rows as {"schema": ..., "payload": ...} where
    payload is one row object OR an array of rows (reference
    CompatibleKafkaConnectDeserializationSchema.java:115-124)."""
    one = T.StructType(
        [
            T.StructField("payload", row_schema, True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )
    arr = T.StructType(
        [
            T.StructField("payload", T.ArrayType(row_schema), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )
    return one, arr


def parse_connect_json(
    df: DataFrame, row_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Kafka-Connect-compatible JSON → (op, _table, ts_ms, _seq, <row>).
    Connect sink records are plain rows (no RowKind, no source offset):
    every row is op='I'. Ordering: Connect envelopes carry no log position,
    so _seq uses the canal-style bit layout — envelope ts_ms in the high
    bits, a deterministic 12-bit hash of the raw envelope line as the
    same-millisecond discriminator, and the row's index within an array
    payload in the low 10 bits (streaming-safe: every term is a pure
    per-row expression). On a real broker prefer the Kafka partition/offset
    as _seq. The ``schema`` half of the envelope is intentionally ignored —
    the declared ``row_schema`` is authoritative (same stance as the
    reference, which converts via its declared SeaTunnelRowType)."""
    one, arr = connect_envelope_schemas(row_schema)
    env_one = F.from_json(F.col(value_col), one)
    env_arr = F.from_json(F.col(value_col), arr)
    rows = F.when(env_arr["payload"].isNotNull(), env_arr["payload"]).otherwise(
        F.array(env_one["payload"])
    )
    ts = F.coalesce(env_arr["ts_ms"], env_one["ts_ms"], F.lit(0))
    ts_checked = F.when(ts < F.lit(1 << 41), ts).otherwise(
        F.raise_error(
            F.concat(
                F.lit("connect ts_ms overflows the 22-bit _seq shift (>= 2^41 ms): "),
                ts.cast("string"),
            )
        )
    )
    out = df.select(
        ts.alias("ts_ms"),
        (
            F.shiftleft(ts_checked, 22)
            + F.shiftleft(F.pmod(F.xxhash64(F.col(value_col)), F.lit(4096)), 10)
        ).alias("_seq0"),
        F.posexplode(rows).alias("_idx", "_row"),
    ).where(F.col("_row").isNotNull())
    return out.select(
        F.lit("I").alias("op"),
        F.lit(None).cast("string").alias("_table"),
        "ts_ms",
        (F.col("_seq0") + F.col("_idx") % 1024).alias("_seq"),
        "_row.*",
    )
