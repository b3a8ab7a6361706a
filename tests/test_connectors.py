"""Tests for wire formats (debezium/canal JSON), assert sink, file connectors."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seatunnel_spark.sinks.assert_sink import AssertError, FieldRule, assert_sink
from seatunnel_spark.sources.files import read_file_source, write_file_sink
from seatunnel_spark.sources.formats import parse_canal_json, parse_debezium_json

ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)


def test_parse_debezium_json(spark):
    msgs = [
        json.dumps({"before": None, "after": {"id": 1, "name": "a"}, "op": "c",
                    "ts_ms": 100, "source": {"table": "t1", "db": "d"}}),
        json.dumps({"before": {"id": 1, "name": "a"}, "after": {"id": 1, "name": "b"},
                    "op": "u", "ts_ms": 200, "source": {"table": "t1", "db": "d"}}),
        json.dumps({"before": {"id": 1, "name": "b"}, "after": None, "op": "d",
                    "ts_ms": 300, "source": {"table": "t1", "db": "d"}}),
        json.dumps({"before": None, "after": {"id": 2, "name": "z"}, "op": "r",
                    "ts_ms": 50, "source": {"table": "t2", "db": "d"}}),
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = parse_debezium_json(df, ROW_SCHEMA).collect()
    by_ts = {r["ts_ms"]: r for r in out}
    assert by_ts[100]["op"] == "I" and by_ts[100]["name"] == "a"
    assert by_ts[200]["op"] == "U" and by_ts[200]["name"] == "b"   # after image
    assert by_ts[300]["op"] == "D" and by_ts[300]["name"] == "b"   # before image
    assert by_ts[50]["op"] == "I" and by_ts[50]["_table"] == "t2"  # READ → insert


def test_parse_canal_json(spark):
    msg = json.dumps(
        {"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], "old": None,
         "type": "UPDATE", "table": "t1", "ts": 42}
    )
    df = spark.createDataFrame([(msg,)], "value string")
    out = parse_canal_json(df, ROW_SCHEMA).collect()
    assert len(out) == 2 and all(r["op"] == "U" for r in out)
    assert {r["id"] for r in out} == {1, 2}


def test_assert_sink_pass_and_fail(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], "id long, name string")
    stats = assert_sink(df, min_rows=3, field_rules=[FieldRule("id", min_value=1, max_value=3)])
    assert stats["_n"] == 3
    with pytest.raises(AssertError, match="null"):
        assert_sink(df, field_rules=[FieldRule("name", not_null=True)])
    with pytest.raises(AssertError, match="row count"):
        assert_sink(df, min_rows=10)
    with pytest.raises(AssertError, match="regex"):
        assert_sink(df.where(F.col("name").isNotNull()),
                    field_rules=[FieldRule("name", regex="^a$")])


def test_file_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    for fmt in ["json", "csv", "parquet", "orc"]:
        p = str(tmp_path / fmt)
        write_file_sink(df, fmt, p, save_mode="overwrite",
                        options={"header": "true"} if fmt == "csv" else None or {})
        back = read_file_source(
            spark, fmt, p,
            schema=df.schema if fmt in ("json", "csv") else None,
            options={"header": "true"} if fmt == "csv" else {},
        )
        assert back.count() == 2
    with pytest.raises(ValueError, match="unsupported"):
        write_file_sink(df, "avro", str(tmp_path / "x"))


def test_queue_changelog_stream_to_lake(spark, tmp_path):
    """Queue-source composition e2e (reference: connector-kafka +
    debezium-json format, the mysqlcdc→kafka→sink e2e shape): a stream of
    raw debezium JSON envelopes — exactly a Kafka topic's value column,
    file-backed here since the sandbox has no broker — parses, routes
    RowKinds, and merges into the lake with the SAME exactly-once job as the
    typed log. Final state equals the pandas oracle."""
    import os

    import pandas as pd

    from seatunnel_spark import oracle
    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.sources import generator as gen
    from seatunnel_spark.streaming.job import CdcIngestJob

    paths = gen.write_fixture(
        str(tmp_path / "fx"), 80, 320, seed=16, n_event_files=2, with_ddl=False
    )
    events = pd.read_parquet(paths["events"])

    # render the fixture log as debezium envelopes, 2 "topic files"
    topic_dir = str(tmp_path / "topic")
    os.makedirs(topic_dir)
    lines = []
    for e in events.itertuples(index=False):
        row = {"repo": e.repo, "path": e.path, "commit": e.commit,
               "lang": e.lang, "content": e.content}
        if e.op == "D":
            env = {"before": row, "after": None, "op": "d"}
        else:
            env = {"before": None, "after": row, "op": "c" if e.op == "I" else "u"}
        env["ts_ms"] = int(e.ts.timestamp() * 1000)
        env["source"] = {"table": "repos", "db": "d", "seq": int(e.seq)}
        lines.append(json.dumps(env))
    half = len(lines) // 2
    for i, chunk in enumerate((lines[:half], lines[half:])):
        with open(os.path.join(topic_dir, f"part-{i:05d}.txt"), "w") as fh:
            fh.write("\n".join(chunk) + "\n")

    empty_base = pd.DataFrame(columns=["repo", "path", "commit", "lang", "content"])
    expected, _ = oracle.replay(empty_base, events)

    root = str(tmp_path / "t")
    LakeTable.create(root, REPO_FIELDS, REPO_KEY, num_buckets=4)
    job = CdcIngestJob(
        spark, root, topic_dir, str(tmp_path / "c"), num_buckets=4,
        wire_format="debezium-json", wire_row_schema=repo_schema(),
    )
    job.run_incremental(available_now=True, timeout_s=300)

    got = LakeTable.load(root).scan(spark).toPandas()
    got = got.sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == len(expected)
    assert (got["content"].values == expected["content"].values).all()
    assert (got["commit"].values == expected["commit"].values).all()

    # idempotence holds for the queue path too: re-run applies nothing new
    t = LakeTable.load(root)
    v = t.version
    job.run_incremental(available_now=True, timeout_s=300)
    assert LakeTable.load(root).version == v


# ---------------------------------------------------------------- JDBC
# Embedded Derby ships in Spark's classpath — a real JDBC database, no
# external server. Reference: connector-jdbc source enumerator + sink
# dialects (JdbcSourceSplitEnumerator.java, MysqlDialect/PostgresDialect).

@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_partitioned_read_numeric(spark, derby_url):
    df = spark.range(0, 1000).selectExpr(
        "id", "cast(id % 7 as double) as v", "concat('k', id % 13) as grp"
    )
    df.write.format("jdbc").option("url", derby_url).option("dbtable", "SRC") \
        .mode("overwrite").save()

    from seatunnel_spark.sources.jdbc import compute_numeric_splits, jdbc_partitioned_read

    # pure split math: covers [lo, hi] exactly, no gaps or overlaps
    splits = compute_numeric_splits(0, 999, 8)
    assert splits[0][0] == 0 and splits[-1][1] == 999
    for (a, b), (c, _) in zip(splits, splits[1:]):
        assert b + 1 == c

    out = jdbc_partitioned_read(spark, derby_url, "SRC", split_column="id",
                                num_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 1000
    assert out.agg({"id": "sum"}).collect()[0][0] == 999 * 1000 // 2


def test_jdbc_partitioned_read_sampled_predicates(spark, derby_url):
    df = spark.range(0, 500).selectExpr("id", "concat('key_', lpad(cast(id as string), 4, '0')) as k")
    df.write.format("jdbc").option("url", derby_url).option("dbtable", "SRC2") \
        .option("createTableColumnTypes", "k VARCHAR(32)").mode("overwrite").save()

    from seatunnel_spark.sources.jdbc import jdbc_partitioned_read, sample_shard_predicates

    preds = sample_shard_predicates(spark, derby_url, "SRC2", "k", num_partitions=4)
    assert len(preds) == 4
    out = jdbc_partitioned_read(spark, derby_url, "SRC2", split_column="k",
                                num_partitions=4, numeric=False)
    # every row exactly once (predicates partition the key space)
    assert out.count() == 500
    assert out.select("id").distinct().count() == 500


def test_jdbc_upsert_roundtrip(spark, derby_url):
    from seatunnel_spark.sinks.jdbc import jdbc_upsert_write
    from seatunnel_spark.sources.jdbc import driver_connection

    conn = driver_connection(spark, derby_url)
    conn.createStatement().execute(
        'CREATE TABLE TGT ("id" BIGINT PRIMARY KEY, "name" VARCHAR(50), "v" DOUBLE)'
    )
    conn.close()

    b1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, name string, v double"
    )
    jdbc_upsert_write(b1, derby_url, "TGT", key=["id"],
                      staging_column_types="name VARCHAR(50)")
    b2 = spark.createDataFrame(
        [(2, "B2", 20.0), (4, "d", 4.0)], "id long, name string, v double"
    )
    sql = jdbc_upsert_write(b2, derby_url, "TGT", key=["id"],
                            staging_column_types="name VARCHAR(50)")
    assert sql.startswith("MERGE INTO TGT")

    got = {
        r["id"]: (r["name"], r["v"])
        for r in spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", "TGT").load().collect()
    }
    assert got == {1: ("a", 1.0), 2: ("B2", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}

    # idempotent: re-applying the same batch converges to the same state
    jdbc_upsert_write(b2, derby_url, "TGT", key=["id"],
                      staging_column_types="name VARCHAR(50)")
    got2 = {
        r["id"]: (r["name"], r["v"])
        for r in spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", "TGT").load().collect()
    }
    assert got2 == got


def test_jdbc_dialect_sql_text():
    """Dialect upsert DML parity (MysqlDialect/PostgresDialect
    getUpsertStatement) — generated text, unit-tested without a server."""
    from seatunnel_spark.sinks.jdbc import DIALECTS

    cols, key = ["id", "name", "v"], ["id"]
    my = DIALECTS["mysql"].upsert_from_staging("t", "t_stage", cols, key)
    assert "ON DUPLICATE KEY UPDATE" in my and "`name` = src.`name`" in my
    assert " new" not in my.lower()  # NEW is reserved in MySQL 8
    pg = DIALECTS["postgres"].upsert_from_staging("t", "t_stage", cols, key)
    assert 'ON CONFLICT ("id")' in pg and 'DO UPDATE SET "name" = EXCLUDED."name"' in pg
    ora = DIALECTS["oracle"].upsert_from_staging("t", "t_stage", cols, key)
    assert ora.startswith("MERGE INTO t t USING t_stage s ON (")
    assert 'UPDATE SET t."name" = s."name"' in ora and not ora.endswith(";")
    ms = DIALECTS["sqlserver"].upsert_from_staging("t", "t_stage", cols, key)
    assert "AS [t] USING t_stage AS [s] ON ([t].[id] = [s].[id])" in ms
    assert ms.endswith(";")  # SQL Server MERGE requires the terminator
    ansi = DIALECTS["ansi"].upsert_from_staging("t", "t_stage", cols, key)
    assert ansi.startswith("MERGE INTO t t USING t_stage s ON") and "WHEN NOT MATCHED" in ansi
    # key-only tables: no UPDATE clause in ANSI merge
    assert "WHEN MATCHED" not in DIALECTS["ansi"].upsert_from_staging("t", "s", ["id"], ["id"])
    # clickhouse: ReplacingMergeTree upsert is a plain INSERT (no MERGE/ON
    # CONFLICT exists — JdbcBatchStatementExecutorBuilder.java:100-105) and
    # delete is the lightweight form (SqlUtils.java:47-55)
    ch = DIALECTS["clickhouse"].upsert_from_staging("t", "t_stage", cols, key)
    assert ch == "INSERT INTO t (`id`, `name`, `v`) SELECT `id`, `name`, `v` FROM t_stage"
    chd = DIALECTS["clickhouse"].delete_from_staging("t", "t_del", key)
    assert chd == ("DELETE FROM t WHERE (`id`) IN (SELECT `id` FROM t_del) "
                   "SETTINGS allow_experimental_lightweight_delete = 1")
    assert "SETTINGS" not in DIALECTS["clickhouse"].delete_from_staging(
        "t", "t_del", key, lightweight=False)
    # clickhouse rejects engineless CREATE TABLE: staging writes must carry
    # an ENGINE clause via createTableOptions; other dialects need none
    assert DIALECTS["clickhouse"].staging_create_options == (
        "ENGINE = MergeTree() ORDER BY tuple()")
    assert DIALECTS["ansi"].staging_create_options is None
    assert DIALECTS["mysql"].staging_create_options is None


def test_parse_mongo_change_stream(spark):
    """MongoDB change-stream envelope (connector-cdc-mongodb wire format):
    insert/replace → I, update → U (post-image), delete → D (documentKey)."""
    from seatunnel_spark.sources.formats import parse_mongo_change_stream

    msgs = [
        json.dumps({"operationType": "insert", "fullDocument": {"id": 1, "name": "a"},
                    "documentKey": {"id": 1}, "ns": {"db": "d", "coll": "t1"},
                    "clusterTime": {"$timestamp": {"t": 100, "i": 1}}}),
        json.dumps({"operationType": "update", "fullDocument": {"id": 1, "name": "b"},
                    "documentKey": {"id": 1}, "ns": {"db": "d", "coll": "t1"},
                    "clusterTime": {"$timestamp": {"t": 200, "i": 1}}}),
        json.dumps({"operationType": "replace", "fullDocument": {"id": 2, "name": "z"},
                    "documentKey": {"id": 2}, "ns": {"db": "d", "coll": "t2"},
                    "clusterTime": {"$timestamp": {"t": 150, "i": 1}}}),
        json.dumps({"operationType": "delete", "fullDocument": None,
                    "documentKey": {"id": 1}, "ns": {"db": "d", "coll": "t1"},
                    "clusterTime": {"$timestamp": {"t": 300, "i": 1}}}),
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = {r["_seq"] // 1000000: r for r in parse_mongo_change_stream(df, ROW_SCHEMA).collect()}
    assert out[100]["op"] == "I" and out[100]["name"] == "a"
    assert out[200]["op"] == "U" and out[200]["name"] == "b"
    assert out[150]["op"] == "I" and out[150]["_table"] == "t2"
    assert out[300]["op"] == "D" and out[300]["id"] == 1 and out[300]["name"] is None


def test_mongo_stream_to_lake(spark, tmp_path):
    """mongodb-json through the same exactly-once job as debezium."""
    import os

    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.streaming.job import CdcIngestJob

    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    lines = []
    for i in range(40):
        doc = {"repo": "o/r1", "path": f"p{i % 8}.py", "commit": f"c{i}",
               "lang": "py", "content": f"v{i}"}
        lines.append(json.dumps({
            "operationType": "insert" if i < 8 else "update",
            "fullDocument": doc, "documentKey": {"repo": "o/r1", "path": doc["path"]},
            "ns": {"db": "d", "coll": "repos"}, "clusterTime": {"$timestamp": {"t": 1, "i": i}},
        }))
    with open(os.path.join(topic, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    root = str(tmp_path / "t")
    LakeTable.create(root, REPO_FIELDS, REPO_KEY, num_buckets=2)
    job = CdcIngestJob(spark, root, topic, str(tmp_path / "c"), num_buckets=2,
                       wire_format="mongodb-json", wire_row_schema=repo_schema())
    job.run_incremental(available_now=True, timeout_s=300)
    got = {r["path"]: r["content"] for r in LakeTable.load(root).scan(spark).collect()}
    assert got == {f"p{k}.py": f"v{32 + k}" for k in range(8)}

    # reference metric-name view (MetricNames.java parity)
    mv = job.metrics_compat()
    names = {r["metric"] for r in mv.collect()}
    assert {"SourceReceivedCount", "SourceReceivedQPS", "SinkWriteCount",
            "SinkWriteQPS", "CDCRecordFetchDelay", "CDCRecordEmitDelay"} <= names


def test_excel_roundtrip(spark, tmp_path):
    """Excel connector (pure-stdlib SpreadsheetML, no POI): write one .xlsx
    per partition, read back with types intact; openable by any xlsx reader."""
    from seatunnel_spark.sources.files import read_file_source, write_file_sink

    df = spark.createDataFrame(
        [(1, "alpha", 1.5, True), (2, "béta & <xml>", 2.0, False), (3, None, None, None)],
        "id long, name string, score double, ok boolean",
    ).repartition(2)
    out = str(tmp_path / "xl")
    write_file_sink(df, "excel", out)
    import os
    files = [f for f in os.listdir(out) if f.endswith(".xlsx")]
    assert 1 <= len(files) <= 2  # one file per non-empty partition

    back = read_file_source(spark, "excel", out)
    got = {r["id"]: (r["name"], r["score"], r["ok"]) for r in back.collect()}
    assert got[1] == ("alpha", 1.5, True)
    assert got[2] == ("béta & <xml>", 2.0, False)  # escaping survives
    assert got[3] == (None, None, None)

    # sanity: the file is a real xlsx any zip/XML reader can open
    import zipfile
    with zipfile.ZipFile(os.path.join(out, files[0])) as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()


def test_canal_ddl_through_stream_evolves_schema(spark, tmp_path):
    """Canal isDdl envelopes carry raw ALTER statements; the stream resolves
    them (parse_alter_sql) into in-flight schema evolution, and post-DDL
    column values ride the `extra` superset map — real binlog DDL semantics
    end-to-end through the queue path."""
    import os

    from pyspark.sql import types as T

    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.streaming.job import CdcIngestJob

    row_schema = T.StructType(
        repo_schema().fields + [T.StructField("stars", T.IntegerType(), True)]
    )
    lines = []
    for i in range(6):  # pre-DDL inserts, no stars anywhere
        lines.append(json.dumps({
            "data": [{"repo": "o/r", "path": f"p{i}.py", "commit": f"c{i}",
                      "lang": "py", "content": f"v{i}", "stars": None}],
            "old": None, "type": "INSERT", "table": "repos", "ts": i,
        }))
    lines.append(json.dumps({
        "data": None, "old": None, "type": "ALTER", "table": "repos", "ts": 6,
        "isDdl": True, "sql": "ALTER TABLE repos ADD COLUMN stars INT",
    }))
    for i in range(7, 10):  # post-DDL updates carrying stars
        lines.append(json.dumps({
            "data": [{"repo": "o/r", "path": f"p{i - 7}.py", "commit": f"c{i}",
                      "lang": "py", "content": f"v{i}", "stars": i * 10}],
            "old": None, "type": "UPDATE", "table": "repos", "ts": i,
        }))
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    with open(os.path.join(topic, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    root = str(tmp_path / "t")
    LakeTable.create(root, REPO_FIELDS, REPO_KEY, num_buckets=2)
    job = CdcIngestJob(spark, root, topic, str(tmp_path / "c"), num_buckets=2,
                       wire_format="canal-json", wire_row_schema=row_schema)
    job.run_incremental(available_now=True, timeout_s=300)

    t = LakeTable.load(root)
    names = [f["name"] for f in t.schema_fields()]
    assert "stars" in names  # the ALTER landed as a metadata commit
    got = {r["path"]: (r["content"], r["stars"]) for r in t.scan(spark).collect()}
    assert got["p0.py"] == ("v7", 70)   # post-DDL update with stars
    assert got["p1.py"] == ("v8", 80)
    assert got["p2.py"] == ("v9", 90)
    assert got["p3.py"] == ("v3", None)  # pre-DDL row, null-filled
    assert len(got) == 6


def test_excel_save_modes_and_schema(spark, tmp_path):
    from pyspark.sql import types as T

    from seatunnel_spark.sources.files import read_file_source, write_file_sink

    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id long, amt double")
    out = str(tmp_path / "xl")
    write_file_sink(df, "excel", out)
    with pytest.raises(FileExistsError):
        write_file_sink(df, "excel", out)  # default error_if_exists
    write_file_sink(df, "excel", out, save_mode="ignore")  # no-op
    write_file_sink(df, "excel", out, save_mode="append")
    assert read_file_source(spark, "excel", out).count() == 4
    write_file_sink(df, "excel", out, save_mode="overwrite")
    back = read_file_source(
        spark, "excel", out,
        schema=T.StructType([T.StructField("id", T.LongType()),
                             T.StructField("amt", T.DoubleType())]),
    )
    # with an explicit schema, whole-number doubles stay doubles
    assert dict(back.dtypes) == {"id": "bigint", "amt": "double"}
    assert back.count() == 2
    with pytest.raises(ValueError, match="partition_by"):
        write_file_sink(df, "excel", str(tmp_path / "p"), partition_by=["id"])


def test_canal_seq_total_order_within_one_millisecond(spark):
    """ADVICE r2: canal `ts` is millisecond-grained, so same-key updates in
    one tick tied on _seq and LWW picked nondeterministically. _seq now folds
    the batch id and the row's index in `data` into the low bits — arrival
    order IS the order, matching how the reference applies canal records."""
    msgs = [
        # two envelopes in the same millisecond: batch ids order them
        json.dumps({"data": [{"id": 1, "name": "first"}], "old": None,
                    "type": "UPDATE", "table": "t", "ts": 42, "id": 7}),
        json.dumps({"data": [{"id": 1, "name": "second"}], "old": None,
                    "type": "UPDATE", "table": "t", "ts": 42, "id": 8}),
        # one envelope, two rows for the same key: array order wins
        json.dumps({"data": [{"id": 2, "name": "older"}, {"id": 2, "name": "newer"}],
                    "old": None, "type": "UPDATE", "table": "t", "ts": 42, "id": 9}),
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = parse_canal_json(df, ROW_SCHEMA).collect()
    seqs = {(r["id"], r["name"]): r["_seq"] for r in out}
    assert seqs[(1, "first")] < seqs[(1, "second")]
    assert seqs[(2, "older")] < seqs[(2, "newer")]
    assert len({r["_seq"] for r in out}) == 4  # total order, no ties
    # and every _seq still sorts after any earlier millisecond
    earlier = json.dumps({"data": [{"id": 3, "name": "x"}], "old": None,
                          "type": "INSERT", "table": "t", "ts": 41, "id": 99999})
    prev = parse_canal_json(
        spark.createDataFrame([(earlier,)], "value string"), ROW_SCHEMA
    ).collect()[0]["_seq"]
    assert prev < min(seqs.values())


def test_canal_two_ddls_same_tick_both_apply(spark, tmp_path):
    """ADVICE r2: DDL epoch ids were `b{batch}.d{seq}` — two ALTERs sharing a
    timestamp-derived seq collided and the second was silently dropped as an
    already-applied epoch. The id now carries the segment index."""
    import os

    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.streaming.job import CdcIngestJob

    row_schema = repo_schema()
    lines = [
        json.dumps({"data": [{"repo": "o/r", "path": "p.py", "commit": "c0",
                              "lang": "py", "content": "v0"}],
                    "old": None, "type": "INSERT", "table": "repos", "ts": 1}),
        # two DDLs in the same millisecond with NO batch id → identical _seq
        json.dumps({"data": None, "old": None, "type": "ALTER", "table": "repos",
                    "ts": 5, "isDdl": True,
                    "sql": "ALTER TABLE repos ADD COLUMN stars INT"}),
        json.dumps({"data": None, "old": None, "type": "ALTER", "table": "repos",
                    "ts": 5, "isDdl": True,
                    "sql": "ALTER TABLE repos ADD COLUMN forks INT"}),
    ]
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    with open(os.path.join(topic, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    root = str(tmp_path / "t")
    LakeTable.create(root, REPO_FIELDS, REPO_KEY, num_buckets=2)
    job = CdcIngestJob(spark, root, topic, str(tmp_path / "c"), num_buckets=2,
                       wire_format="canal-json", wire_row_schema=row_schema)
    job.run_incremental(available_now=True, timeout_s=300)
    names = [f["name"] for f in LakeTable.load(root).schema_fields()]
    assert "stars" in names and "forks" in names


def test_changelog_serialization_round_trips(spark, tmp_path):
    """Serialization side of the wire formats (DebeziumJson/CanalJson
    SerializationSchema parity): rows → envelopes → our own parsers →
    identical rows, ops, and ordering."""
    from seatunnel_spark.sinks.changelog import write_changelog
    from seatunnel_spark.sources.formats import parse_debezium_json, parse_canal_json

    rows = [
        (1, "a", "I", 10),
        (1, "a2", "U", 11),
        (2, "b", "I", 12),
        (1, None, "D", 13),
    ]
    df = spark.createDataFrame(rows, "id long, name string, op string, seq long")

    dbz_dir = str(tmp_path / "dbz")
    write_changelog(df, dbz_dir, "debezium-json", ["id", "name"], table="t1")
    back = parse_debezium_json(
        spark.read.text(dbz_dir), ROW_SCHEMA
    ).collect()
    got = {(r["_seq"]): (r["op"], r["id"], r["name"], r["_table"]) for r in back}
    assert got[10] == ("I", 1, "a", "t1")
    assert got[11] == ("U", 1, "a2", "t1")
    assert got[13][0] == "D" and got[13][1] == 1  # delete keeps the key image

    canal_dir = str(tmp_path / "canal")
    write_changelog(df, canal_dir, "canal-json", ["id", "name"], table="t1")
    back = parse_canal_json(spark.read.text(canal_dir), ROW_SCHEMA).collect()
    assert len(back) == 4
    by_seq = sorted(back, key=lambda r: r["_seq"])
    assert [r["op"] for r in by_seq] == ["I", "U", "I", "D"]
    assert by_seq[1]["name"] == "a2"


def test_lake_changes_feed_reingests_via_wire_format(spark, tmp_path):
    """The full loop: lake change feed → canal topic → a SECOND ingest job
    consumes it — lake-as-CDC-source feeding another CDC consumer."""
    from seatunnel_spark.lake import LakeTable, merge_into
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.sinks.changelog import write_changelog
    from seatunnel_spark.streaming.job import CdcIngestJob

    src_root = str(tmp_path / "src")
    t = LakeTable.create(src_root, REPO_FIELDS, REPO_KEY, num_buckets=2)
    batch = spark.createDataFrame(
        [("o/r", "a.py", "c1", "py", "v1", "I", 1),
         ("o/r", "b.py", "c2", "py", "v2", "I", 2)],
        "repo string, path string, commit string, lang string, content string, "
        "op string, seq long",
    )
    merge_into(spark, t, batch, "e1")
    changed = t.scan(spark, include_meta=True).select(
        "repo", "path", "commit", "lang", "content",
        F.when(F.col("_op") == "D", "D").otherwise("U").alias("op"),
        F.col("_seq").alias("seq"),
    )
    topic = str(tmp_path / "topic")
    write_changelog(changed, topic, "canal-json",
                    ["repo", "path", "commit", "lang", "content"], table="repos")

    dst_root = str(tmp_path / "dst")
    LakeTable.create(dst_root, REPO_FIELDS, REPO_KEY, num_buckets=2)
    job = CdcIngestJob(spark, dst_root, topic, str(tmp_path / "ckpt"),
                       num_buckets=2, wire_format="canal-json",
                       wire_row_schema=repo_schema())
    job.run_incremental(available_now=True, timeout_s=300)
    got = {r["path"]: r["content"]
           for r in LakeTable.load(dst_root).scan(spark).collect()}
    assert got == {"a.py": "v1", "b.py": "v2"}


def test_debezium_ddl_through_stream_evolves_schema(spark, tmp_path):
    """VERDICT r3 #2: the debezium wire format (the MORE common one) must
    route schema-change envelopes into the same in-flight DDL evolution the
    canal path has — interleaved DML + ALTER on one topic, lake table
    evolves at the correct offset. Reference: SchemaChangeResolver.java:27-32,
    seatunnel-format-compatible-debezium-json."""
    import os

    from pyspark.sql import types as T

    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.streaming.job import CdcIngestJob

    row_schema = T.StructType(
        repo_schema().fields + [T.StructField("stars", T.IntegerType(), True)]
    )

    def env(i, op, row):
        return json.dumps({
            "before": None, "after": row, "op": op, "ts_ms": i,
            "source": {"table": "repos", "db": "d", "seq": i},
        })

    lines = []
    for i in range(6):  # pre-DDL inserts, no stars anywhere
        lines.append(env(i, "c", {
            "repo": "o/r", "path": f"p{i}.py", "commit": f"c{i}",
            "lang": "py", "content": f"v{i}", "stars": None,
        }))
    # debezium schema-change envelope: top-level ddl + tableChanges
    lines.append(json.dumps({
        "source": {"table": "repos", "db": "d", "seq": 6}, "ts_ms": 6,
        "ddl": "ALTER TABLE repos ADD COLUMN stars INT",
        "tableChanges": [{"type": "ALTER", "id": '"d"."repos"'}],
    }))
    for i in range(7, 10):  # post-DDL updates carrying stars
        lines.append(env(i, "u", {
            "repo": "o/r", "path": f"p{i - 7}.py", "commit": f"c{i}",
            "lang": "py", "content": f"v{i}", "stars": i * 10,
        }))
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    with open(os.path.join(topic, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    root = str(tmp_path / "t")
    LakeTable.create(root, REPO_FIELDS, REPO_KEY, num_buckets=2)
    job = CdcIngestJob(spark, root, topic, str(tmp_path / "c"), num_buckets=2,
                       wire_format="debezium-json", wire_row_schema=row_schema)
    job.run_incremental(available_now=True, timeout_s=300)

    t = LakeTable.load(root)
    names = [f["name"] for f in t.schema_fields()]
    assert "stars" in names  # the ALTER landed as a metadata commit
    got = {r["path"]: (r["content"], r["stars"]) for r in t.scan(spark).collect()}
    assert got["p0.py"] == ("v7", 70)   # post-DDL update with stars
    assert got["p1.py"] == ("v8", 80)
    assert got["p2.py"] == ("v9", 90)
    assert got["p3.py"] == ("v3", None)  # pre-DDL row, null-filled
    assert len(got) == 6


def test_debezium_schema_change_envelope_shapes(spark):
    """Both debezium schema-change spellings parse to op='DDL' + _ddl:
    the history-topic shape (top-level ddl, table id only in tableChanges)
    and the legacy historyRecord-as-JSON-string shape."""
    msgs = [
        # history-topic shape: no source.table — tableChanges id is the
        # fallback, `"db"."tbl"` unquoted to the bare table name
        json.dumps({
            "ts_ms": 5, "ddl": "ALTER TABLE t ADD COLUMN x INT",
            "tableChanges": [{"type": "ALTER", "id": '"mydb"."t"'}],
        }),
        # legacy shape: ddl rides inside the escaped historyRecord payload
        json.dumps({
            "ts_ms": 6, "source": {"table": "t", "db": "mydb", "seq": 6},
            "historyRecord": json.dumps(
                {"ddl": "ALTER TABLE t DROP COLUMN y", "position": {}}
            ),
        }),
        # a normal data envelope stays a data row
        json.dumps({
            "before": None, "after": {"id": 1, "name": "a"}, "op": "c",
            "ts_ms": 7, "source": {"table": "t", "db": "mydb", "seq": 7},
        }),
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = sorted(parse_debezium_json(df, ROW_SCHEMA).collect(),
                 key=lambda r: r["ts_ms"])
    assert out[0]["op"] == "DDL"
    assert out[0]["_ddl"] == "ALTER TABLE t ADD COLUMN x INT"
    assert out[0]["_table"] == "t"
    assert out[1]["op"] == "DDL"
    assert out[1]["_ddl"] == "ALTER TABLE t DROP COLUMN y"
    assert out[1]["_table"] == "t"
    assert out[2]["op"] == "I" and out[2]["_ddl"] is None
    assert out[2]["name"] == "a"


def test_canal_ts_overflow_raises(spark):
    """ADVICE r3: _seq = ts<<22 overflows int64 once ts >= 2^41 (epoch ms
    past ~2039, or a seq mis-wired into the ts slot). Boundary timestamps
    below the limit parse; at the limit the parser raises instead of
    silently wrapping LWW order."""
    import pyspark.errors

    ok = json.dumps({"data": [{"id": 1, "name": "a"}], "old": None,
                     "type": "INSERT", "table": "t", "ts": (1 << 41) - 1})
    row = parse_canal_json(
        spark.createDataFrame([(ok,)], "value string"), ROW_SCHEMA
    ).collect()[0]
    assert row["_seq"] == ((1 << 41) - 1) << 22  # no id/idx bits, max ts
    assert row["_seq"] > 0  # int64-safe by construction

    bad = json.dumps({"data": [{"id": 1, "name": "a"}], "old": None,
                      "type": "INSERT", "table": "t", "ts": 1 << 41})
    with pytest.raises(Exception, match="overflows the 22-bit"):
        parse_canal_json(
            spark.createDataFrame([(bad,)], "value string"), ROW_SCHEMA
        ).collect()


def test_canal_round_trip_keeps_event_time_and_order(spark, tmp_path):
    """ADVICE r3: to_canal_json used to write the seq into canal's ts slot —
    a parser-derived seq (~2^63) then wrapped on re-parse, corrupting LWW
    order. Now ts carries real event-time ms and the seq rides as the id,
    so the advertised lake→canal→re-parse loop preserves both the event
    time and the per-key order, including for seqs far above 2^41."""
    from seatunnel_spark.sinks.changelog import to_canal_json

    big = (1 << 41) * 1000  # a seq of parser-derived magnitude
    df = spark.createDataFrame(
        [(1, "old", "I", big + 1, 1.5), (1, "new", "U", big + 2, 1.5),
         (2, "x", "I", big + 3, 2.0)],
        "id long, name string, op string, seq long, ts double",
    )
    out = to_canal_json(df, ["id", "name"], "t1", ts_col="ts")
    back = parse_canal_json(out, ROW_SCHEMA).collect()
    assert len(back) == 3
    by_name = {r["name"]: r for r in back}
    # event time survives the round trip (ts seconds → canal ms)
    assert by_name["old"]["ts_ms"] == 1500
    assert by_name["x"]["ts_ms"] == 2000
    # same-millisecond rows keep their seq order via the id low bits
    assert by_name["old"]["_seq"] < by_name["new"]["_seq"]


def test_parse_connect_json_both_payload_shapes(spark):
    """Kafka-Connect-compatible JSON (seatunnel-format-compatible-connect-
    json, CompatibleKafkaConnectDeserializationSchema.java:115-124): payload
    may be one row object or an array of rows; both parse to op='I' rows in
    arrival order."""
    from seatunnel_spark.sources.formats import parse_connect_json

    msgs = [
        json.dumps({"schema": {"type": "struct"},
                    "payload": {"id": 1, "name": "a"}, "ts_ms": 10}),
        json.dumps({"schema": {"type": "struct"},
                    "payload": [{"id": 2, "name": "b"}, {"id": 3, "name": "c"}],
                    "ts_ms": 11}),
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = sorted(parse_connect_json(df, ROW_SCHEMA).collect(),
                 key=lambda r: r["_seq"])
    assert [(r["id"], r["name"], r["op"]) for r in out] == [
        (1, "a", "I"), (2, "b", "I"), (3, "c", "I")]
    assert out[0]["ts_ms"] == 10 and out[1]["ts_ms"] == 11
    # arrival order is the _seq order; in-envelope rows keep array order
    assert out[1]["_seq"] < out[2]["_seq"]


def test_connect_json_through_queue_to_lake(spark, tmp_path):
    """connect-json end-to-end through the queue path: Connect sink records
    (append-only rows) land as upserts keyed by PK, last arrival wins."""
    import os

    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.streaming.job import CdcIngestJob

    lines = [
        json.dumps({"payload": {"repo": "o/r", "path": "a.py", "commit": "c1",
                                "lang": "py", "content": "v1"}, "ts_ms": 1}),
        json.dumps({"payload": [{"repo": "o/r", "path": "b.py", "commit": "c2",
                                 "lang": "py", "content": "v2"},
                                {"repo": "o/r", "path": "a.py", "commit": "c3",
                                 "lang": "py", "content": "v3"}], "ts_ms": 2}),
    ]
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    with open(os.path.join(topic, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    root = str(tmp_path / "t")
    LakeTable.create(root, REPO_FIELDS, REPO_KEY, num_buckets=2)
    job = CdcIngestJob(spark, root, topic, str(tmp_path / "c"), num_buckets=2,
                       wire_format="connect-json", wire_row_schema=repo_schema())
    job.run_incremental(available_now=True, timeout_s=300)
    got = {r["path"]: r["content"]
           for r in LakeTable.load(root).scan(spark).collect()}
    assert got == {"a.py": "v3", "b.py": "v2"}


def test_delimited_text_format_roundtrip(spark, tmp_path):
    """seatunnel-format-text parity (TextDeserializationSchema /
    TextSerializationSchema, TextFormatConstant.SEPARATOR): typed rows as
    \\x01-delimited lines with \\x02/\\x03 nesting for arrays and maps;
    nulls as empty; custom delimiters incl. regex metachars."""
    from seatunnel_spark.sources.files import (
        read_delimited_text,
        write_delimited_text,
    )

    df = spark.createDataFrame(
        [
            (1, "alice", 3.5, True, ["a", "b"], {"k1": 10, "k2": 20}),
            (2, None, None, None, None, None),
        ],
        "id long, name string, score double, ok boolean, "
        "tags array<string>, counts map<string, int>",
    )
    p = str(tmp_path / "txt")
    write_delimited_text(df, p)
    back = read_delimited_text(spark, p, df.schema)
    assert dict(back.dtypes) == dict(df.dtypes)
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["name"] == "alice" and rows[1]["score"] == 3.5
    assert rows[1]["ok"] is True
    assert rows[1]["tags"] == ["a", "b"]
    assert rows[1]["counts"] == {"k1": 10, "k2": 20}
    # nulls round-trip as NULL for typed fields ("" stays "" for strings)
    assert rows[2]["score"] is None and rows[2]["ok"] is None
    assert rows[2]["counts"] is None

    # custom delimiter that is a regex metachar must be treated literally
    p2 = str(tmp_path / "pipe")
    flat = df.select("id", "name", "score")
    write_delimited_text(flat, p2, field_delimiter="|")
    back2 = read_delimited_text(spark, p2, flat.schema, field_delimiter="|")
    got = {r["id"]: (r["name"], r["score"]) for r in back2.collect()}
    assert got[1] == ("alice", 3.5)
