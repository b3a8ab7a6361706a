"""Real-Iceberg adapter seam (lake/iceberg.py): the SQL-text layer is
unit-tested exactly like the JDBC dialects — statements verifiable without a
catalog, executable verbatim on one. Reference: the sink-target swap surface
SinkWriter.java:38-89 / SinkAggregatedCommitter.java:33-60."""

from seatunnel_spark.lake.iceberg import IcebergSqlBackend, to_iceberg_type
from seatunnel_spark.schema import parse_alter_sql


def _backend(run_sql=None):
    return IcebergSqlBackend("lake.db.repos", ["repo", "path"], run_sql=run_sql)


def test_create_table_sql_text():
    sql = _backend().create_sql(
        [("repo", "string"), ("path", "string"), ("content", "string")], num_buckets=32
    )
    assert "CREATE TABLE IF NOT EXISTS lake.db.repos" in sql
    assert "USING iceberg" in sql
    # bucketed by the merge key → storage-partitioned MERGE, O(batch) shuffle
    assert "PARTITIONED BY (bucket(32, repo))" in sql
    # row-level deletes need v2; MOR keeps commits O(batch) not O(table)
    assert "'format-version'='2'" in sql
    assert "'write.merge.mode'='merge-on-read'" in sql
    # _seq is a real column — it IS the exactly-once mechanism
    assert "_seq bigint" in sql


def test_merge_sql_is_seq_guarded_lww():
    sql = _backend().merge_sql("batch_src", ["repo", "path", "commit", "content"])
    assert sql.startswith("MERGE INTO lake.db.repos t USING batch_src s ON ")
    assert "t.repo = s.repo AND t.path = s.path" in sql
    # the three guarded clauses: replay-idempotent, out-of-order-safe
    assert "WHEN MATCHED AND s.op = 'D' AND s.seq >= t._seq THEN DELETE" in sql
    assert "WHEN MATCHED AND s.op <> 'D' AND s.seq > t._seq THEN UPDATE SET" in sql
    assert "t.commit = s.commit" in sql and "t._seq = s.seq" in sql
    assert (
        "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT "
        "(repo, path, commit, content, _seq) "
        "VALUES (s.repo, s.path, s.commit, s.content, s.seq)" in sql
    )
    # key columns are never in the UPDATE SET list
    assert "t.repo = s.repo," not in sql.split("UPDATE SET")[1]


def test_alter_sql_covers_the_ddl_surface():
    b = _backend()
    assert b.alter_sql(parse_alter_sql("ALTER TABLE t ADD COLUMN stars INT")) == [
        "ALTER TABLE lake.db.repos ADD COLUMN stars int"
    ]
    assert b.alter_sql(parse_alter_sql("ALTER TABLE t DROP COLUMN lang")) == [
        "ALTER TABLE lake.db.repos DROP COLUMN lang"
    ]
    assert b.alter_sql(
        parse_alter_sql("ALTER TABLE t RENAME COLUMN commit TO commit_sha")
    ) == ["ALTER TABLE lake.db.repos RENAME COLUMN commit TO commit_sha"]
    assert b.alter_sql(parse_alter_sql("ALTER TABLE t MODIFY stars BIGINT")) == [
        "ALTER TABLE lake.db.repos ALTER COLUMN stars TYPE bigint"
    ]
    # MySQL CHANGE (rename + restated type) → two statements, MySQL type
    # spellings normalized to Iceberg's vocabulary
    stmts = b.alter_sql(
        parse_alter_sql("ALTER TABLE t CHANGE `commit` commit_sha VARCHAR(64)")
    )
    assert stmts == [
        "ALTER TABLE lake.db.repos RENAME COLUMN commit TO commit_sha",
        "ALTER TABLE lake.db.repos ALTER COLUMN commit_sha TYPE string",
    ]


def test_type_mapping_to_iceberg():
    assert to_iceberg_type("varchar(255)") == "string"
    assert to_iceberg_type("int(11) unsigned") == "int"
    assert to_iceberg_type("tinyint") == "int"  # Iceberg spec has no byte
    assert to_iceberg_type("NUMERIC(10,2)") == "decimal(10,2)"
    assert to_iceberg_type("mediumblob") == "binary"
    assert to_iceberg_type("datetime(3)") == "timestamp"


def test_maintenance_and_lineage_sql():
    b = _backend()
    assert b.epoch_scan_sql("b7.s0") == (
        "SELECT snapshot_id FROM lake.db.repos.snapshots "
        "WHERE summary['epoch-id'] = 'b7.s0'"
    )
    assert b.compact_sql("lake") == (
        "CALL lake.system.rewrite_data_files(table => 'db.repos', strategy => 'binpack')"
    )
    exp = b.expire_sql("lake", "2026-08-01 00:00:00", retain_last=20)
    assert "expire_snapshots" in exp and "retain_last => 20" in exp


def test_merge_into_reduces_then_runs_one_statement(spark):
    """The execution path: LWW-reduce the batch (shared reducer — hot keys
    partially combine map-side) then run ONE guarded MERGE against the fake
    executor. The reduced view must contain only the last event per key."""
    ran = []

    def fake_sql(stmt):
        ran.append(stmt)

    b = _backend(run_sql=fake_sql)
    batch = spark.createDataFrame(
        [
            ("o/r", "a.py", "c1", "v1", "I", 1),
            ("o/r", "a.py", "c2", "v2", "U", 2),  # later event wins
            ("o/r", "b.py", "c3", "v3", "I", 3),
        ],
        "repo string, path string, commit string, content string, op string, seq long",
    )
    res = b.merge_into(batch, epoch_id="b0.s0")
    assert len(ran) == 1 and ran[0] == res["merge_sql"]
    view = ran[0].split(" USING ")[1].split(" ")[0]
    rows = {(r["path"]): (r["commit"], r["seq"]) for r in spark.table(view).collect()}
    assert rows == {"a.py": ("c2", 2), "b.py": ("c3", 3)}


def test_update_schema_noop_parity():
    """A replayed ADD COLUMN raises 'already exists' on Iceberg — the
    backend absorbs it as the same no-op the LakeTable epoch ledger gives."""
    calls = []

    def flaky_sql(stmt):
        calls.append(stmt)
        if "ADD COLUMN" in stmt and len(calls) > 1:
            raise Exception("Cannot add column, name already exists: stars")

    b = _backend(run_sql=flaky_sql)
    ch = parse_alter_sql("ALTER TABLE t ADD COLUMN stars INT")
    assert b.update_schema(ch, "d1") is True
    assert b.update_schema(ch, "d1") is False  # replay → absorbed no-op
    import pytest

    def broken_sql(stmt):
        raise Exception("Table or view not found: lake.db.repos")

    b2 = _backend(run_sql=broken_sql)
    with pytest.raises(Exception, match="not found"):
        b2.update_schema(ch, "d2")


def test_config_switch_iceberg_dry_run(spark):
    """The one-config switch: sink plugin Iceberg instead of LakeTable.
    dry_run returns the statements a real catalog would execute."""
    from seatunnel_spark.config import run_job

    cfg = {
        "source": [
            {
                "plugin": "FakeSource",
                "result_table_name": "t1",
                "row.num": 4,
                "schema": {"fields": {"repo": "string", "path": "string", "content": "string"}},
            }
        ],
        "sink": [
            {
                "plugin": "Iceberg",
                "source_table_name": "t1",
                "table": "lake.db.repos",
                "primary_keys": ["repo", "path"],
                "num_buckets": 8,
                "dry_run": True,
            }
        ],
    }
    out = run_job(spark, cfg)["Iceberg#0"]
    assert out["dry_run"] is True
    assert "PARTITIONED BY (bucket(8, repo))" in out["create_sql"]
    assert "WHEN MATCHED AND s.op = 'D' AND s.seq >= t._seq THEN DELETE" in out["merge_sql"]


def test_read_path_sql_text():
    """Time travel + incremental read surface (LakeTable.scan(snapshot_id=)
    and changes_between parity on a real catalog)."""
    import pytest

    b = _backend()
    assert b.time_travel_sql(snapshot_id=42) == (
        "SELECT * FROM lake.db.repos VERSION AS OF 42"
    )
    assert b.time_travel_sql(as_of="2026-08-01 00:00:00") == (
        "SELECT * FROM lake.db.repos TIMESTAMP AS OF TIMESTAMP '2026-08-01 00:00:00'"
    )
    with pytest.raises(ValueError, match="exactly one"):
        b.time_travel_sql()
    assert b.changes_read_options(7) == {"start-snapshot-id": "7"}
    assert b.changes_read_options(7, 9) == {
        "start-snapshot-id": "7", "end-snapshot-id": "9",
    }


def test_epoch_stamp_contract_is_consistent():
    """VERDICT r3 #7: epoch_scan_sql reads summary['epoch-id'], which only
    writer-API commits can stamp. The contract is now explicit: the write
    options and the scan SQL share one summary key by construction, and SQL
    MERGE commits (which cannot carry snapshot properties) are documented
    as seq-guard-only."""
    b = _backend()
    opts = b.snapshot_property_options("epoch-42")
    key = f"snapshot-property.{IcebergSqlBackend.EPOCH_SUMMARY_KEY}"
    assert opts == {key: "epoch-42"}
    scan = b.epoch_scan_sql("epoch-42")
    assert f"summary['{IcebergSqlBackend.EPOCH_SUMMARY_KEY}']" in scan
    assert "'epoch-42'" in scan
    # the merge path never claims epoch-stamp observability: no
    # snapshot-property clause can appear in SQL MERGE text
    assert "snapshot-property" not in b.merge_sql("src", ["repo", "path", "content"])


def test_config_iceberg_execute_path_autocreates(spark):
    """ADVICE r3: dry_run=false used to skip create_sql, so the first
    deployment's MERGE hit a missing table. The execute path now runs
    CREATE TABLE IF NOT EXISTS (idempotent) before every MERGE."""
    from seatunnel_spark.config import _run_sink

    ran = []

    def fake_sql(stmt):
        ran.append(stmt)

        class _R:
            def count(self):
                return 0

        return _R()

    df = spark.createDataFrame(
        [("o/r", "a.py", "v1", "I", 1)],
        "repo string, path string, content string, op string, seq long",
    )
    import unittest.mock as mock

    with mock.patch.object(type(df.sparkSession), "sql", side_effect=fake_sql):
        _run_sink({"plugin": "Iceberg", "table": "lake.db.repos",
                   "primary_keys": ["repo", "path"], "epoch_id": "e1"}, df)
    assert ran[0].startswith("CREATE TABLE IF NOT EXISTS lake.db.repos")
    assert any(s.startswith("MERGE INTO lake.db.repos") for s in ran)
    assert ran.index(next(s for s in ran if s.startswith("MERGE"))) > 0
