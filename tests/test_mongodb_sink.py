"""MongoDB sink seam: RowKind → write-model routing, ordered-bulk command
splitting, and the config surface (dry_run-only, loud otherwise)."""

from __future__ import annotations

import pytest

from seatunnel_spark.sinks.mongodb import (
    commands_as_json,
    db_commands,
    write_models,
)

COLS = ["id", "name"]
PK = ["id"]


def test_write_model_routing_upsert_mode():
    rows = [
        {"id": 1, "name": "a", "op": "I"},
        {"id": 1, "name": "a", "op": "-U"},   # skipped (writer contract)
        {"id": 1, "name": "a2", "op": "U"},
        {"id": 2, "name": "b", "op": "D"},
    ]
    models = write_models(rows, COLS, PK, upsert=True)
    assert [k for k, _ in models] == ["update", "update", "delete"]
    assert models[0][1] == {"q": {"id": 1}, "u": {"$set": {"id": 1, "name": "a"}},
                            "upsert": True}
    assert models[2][1] == {"q": {"id": 2}, "limit": 1}
    # upsert disabled: INSERT becomes a bare document, UPDATE has no upsert
    models = write_models(rows, COLS, PK, upsert=False)
    assert [k for k, _ in models] == ["insert", "update", "delete"]
    assert models[0][1] == {"id": 1, "name": "a"}
    assert "upsert" not in models[1][1]
    with pytest.raises(ValueError, match="primary_keys"):
        write_models(rows, COLS, [])


def test_ordered_bulk_command_split_preserves_cross_kind_order():
    models = write_models(
        [
            {"id": 1, "name": "x", "op": "I"},
            {"id": 2, "name": "y", "op": "I"},
            {"id": 1, "name": None, "op": "D"},
            {"id": 1, "name": "z", "op": "I"},  # delete-then-reinsert of id 1
        ],
        COLS, PK, upsert=False,
    )
    cmds = db_commands(models, "repos")
    kinds = [next(iter(c)) for c in cmds]
    assert kinds == ["insert", "delete", "insert"]  # order NOT collapsed
    assert len(cmds[0]["documents"]) == 2 and len(cmds[2]["documents"]) == 1
    assert all(c["ordered"] is True for c in cmds)
    assert cmds[1]["deletes"] == [{"q": {"id": 1}, "limit": 1}]
    js = commands_as_json(cmds)
    assert js.count("\n") == 2  # one command per line


def test_mongodb_conf_dry_run_only(spark):
    from seatunnel_spark.config import ConfigError, run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 4
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      MongoDB { source_table_name = "t"
                uri = "mongodb://m:27017"  database = "test"
                collection = "repos"  primary-key = "id"
                upsert-enable = true  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    out = res["MongoDB#0"]
    assert out["dry_run"] and out["database"] == "test"
    assert len(out["commands"]) == 1  # all four rows: one update command
    ups = out["commands"][0]["updates"]
    assert len(ups) == 4 and all(u["upsert"] for u in ups)
    with pytest.raises(ConfigError, match="dry_run-only"):
        run_job(spark, load_job_config(conf.replace("dry_run = true",
                                                    "dry_run = false")))
