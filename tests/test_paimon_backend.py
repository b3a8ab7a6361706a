"""Paimon Spark-SQL seam (lake/paimon.py): statement-text parity with the
engine's LWW contract — primary-key + sequence.field table DDL,
append-as-upsert, the shared guarded MERGE, and maintenance procedures."""

from __future__ import annotations

from seatunnel_spark.lake.paimon import PaimonSqlBackend

FIELDS = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("stars", "int")]
KEY = ["repo", "path"]


def test_create_table_carries_lww_properties():
    b = PaimonSqlBackend("cat.db.repos", KEY)
    sql = b.create_sql(FIELDS, num_buckets=8)
    assert sql.startswith("CREATE TABLE IF NOT EXISTS cat.db.repos (")
    assert "USING paimon" in sql
    assert "'primary-key'='repo,path'" in sql
    assert "'bucket'='8'" in sql
    # sequence.field IS the LWW mechanism: max _seq wins regardless of
    # arrival order, making replayed appends row-wise idempotent
    assert "'sequence.field'='_seq'" in sql
    assert "'merge-engine'='deduplicate'" in sql
    assert "_seq bigint" in sql


def test_append_upsert_needs_no_merge():
    b = PaimonSqlBackend("cat.db.repos", KEY)
    sql = b.append_upsert_sql("batch_src", [n for n, _ in FIELDS])
    assert sql == (
        "INSERT INTO cat.db.repos (repo, path, commit, stars, _seq) "
        "SELECT s.repo, s.path, s.commit, s.stars, s.seq FROM batch_src s"
    )


def test_shared_guarded_merge_text():
    # delete-carrying batches reuse the Iceberg seam's guarded MERGE verbatim
    b = PaimonSqlBackend("cat.db.repos", KEY)
    sql = b.merge_sql("batch_src", [n for n, _ in FIELDS])
    assert "WHEN MATCHED AND s.op = 'D' AND s.seq >= t._seq THEN DELETE" in sql
    assert "WHEN MATCHED AND s.op <> 'D' AND s.seq > t._seq" in sql
    assert "WHEN NOT MATCHED AND s.op <> 'D'" in sql


def test_maintenance_and_incremental_read():
    b = PaimonSqlBackend("cat.db.repos", KEY)
    assert b.compact_sql("cat") == "CALL cat.sys.compact(table => 'db.repos')"
    exp = b.expire_sql("cat", "2026-01-01 00:00:00", retain_last=10)
    assert "cat.sys.expire_snapshots" in exp and "retain_min => 10" in exp
    assert b.changes_read_options(5) == {"scan.snapshot-id": "5"}
    assert b.changes_read_options(5, 9) == {"incremental-between": "5,9"}


def test_config_switch_paimon_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 4
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      Paimon { source_table_name = "t"  table = "cat.db.sink"
               primary_keys = ["id"]  num_buckets = 4  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    out = res["Paimon#0"]
    assert out["dry_run"]
    assert "'primary-key'='id'" in out["create_sql"]
    assert "'bucket'='4'" in out["create_sql"]
    assert out["merge_sql"].startswith("MERGE INTO cat.db.sink t USING batch_src s")
    assert out["append_upsert_sql"].startswith("INSERT INTO cat.db.sink")
