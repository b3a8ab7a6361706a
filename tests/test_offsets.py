"""Dialect CDC offset parity: MySQL BinlogOffset (GTID sets), SqlServer
LsnOffset, MongoDB ChangeStreamOffset — reference comparison semantics
(connector-cdc-{base,mysql,sqlserver,mongodb} offset classes) plus the
SPECIFIC_OFFSET startup/stop resolve on the debezium wire."""

import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from seatunnel_spark.offsets import (
    INITIAL_BINLOG,
    INITIAL_LSN,
    NO_STOPPING_BINLOG,
    NO_STOPPING_CHANGE_STREAM,
    NO_STOPPING_LSN,
    BinlogOffset,
    ChangeStreamOffset,
    GtidSet,
    Lsn,
    LsnOffset,
    decode_resume_token_timestamp,
)


# ---------------------------------------------------------------- binlog

def test_binlog_file_pos_order():
    a = BinlogOffset("mysql-bin.000001", 100)
    b = BinlogOffset("mysql-bin.000001", 200)
    c = BinlogOffset("mysql-bin.000002", 4)
    assert a.is_before(b) and b.is_before(c) and a.is_before(c)
    assert c.is_after(a) and b.is_at_or_after(a)
    assert a.is_at_or_before(BinlogOffset("MYSQL-BIN.000001", 100))
    # filenames compare case-insensitively (BinlogOffset.java:196)
    assert BinlogOffset("A.2", 0).compare_to(BinlogOffset("a.10", 0)) != 0


def test_binlog_skip_counters_break_ties():
    base = dict(filename="f.1", position=50)
    a = BinlogOffset(**base, events_to_skip=1, rows_to_skip=0)
    b = BinlogOffset(**base, events_to_skip=1, rows_to_skip=3)
    c = BinlogOffset(**base, events_to_skip=2)
    assert a.is_before(b) and b.is_before(c)
    assert BinlogOffset(**base).compare_to(BinlogOffset(**base)) == 0


def test_binlog_no_stopping_is_max():
    real = BinlogOffset("mysql-bin.999999", 2**40)
    assert real.is_before(NO_STOPPING_BINLOG)
    assert NO_STOPPING_BINLOG.is_after(real)
    assert NO_STOPPING_BINLOG.compare_to(NO_STOPPING_BINLOG) == 0
    assert INITIAL_BINLOG.is_at_or_before(real)


def test_binlog_gtid_rules():
    u1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    u2 = "0c59b3e8-0000-11e1-0000-c80aa9400000"
    sub = BinlogOffset("x", 0, gtid_set=f"{u1}:1-5")
    sup = BinlogOffset("y", 0, gtid_set=f"{u1}:1-9,{u2}:1-2")
    none = BinlogOffset("z", 10**9)
    # subset GTIDs -> before (BinlogOffset.java:135-148)
    assert sub.is_before(sup) and sup.is_after(sub)
    # no GTIDs vs GTIDs -> assume older (BinlogOffset.java:150-165)
    assert none.is_before(sup) and sub.is_after(none)
    # equal GTID sets -> events-to-skip tiebreak
    a = BinlogOffset("a", 0, gtid_set=f"{u1}:1-5", events_to_skip=1)
    b = BinlogOffset("b", 0, gtid_set=f"{u1}:1-3:4-5", events_to_skip=2)
    assert a.is_before(b)  # interval spellings normalize equal


def test_binlog_cross_server_timestamps():
    a = BinlogOffset("f.9", 900, ts_sec=100, server_id=1)
    b = BinlogOffset("f.1", 4, ts_sec=200, server_id=2)
    # different servers, both timestamps present -> ts order wins even
    # though a's coordinates are "larger" (BinlogOffset.java:176-190)
    assert a.is_before(b)
    # watermark offsets carry ts_sec=0 -> fall through to filename
    w = BinlogOffset("f.0", 0, ts_sec=0, server_id=2)
    assert w.is_before(a)


def test_gtid_set_parsing():
    u = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    assert GtidSet(f"{u}:1-3:4-5") == GtidSet(f"{u}:1-5")
    assert GtidSet(f"{u}:1-3").is_contained_within(GtidSet(f"{u}:1-5"))
    assert not GtidSet(f"{u}:1-6").is_contained_within(GtidSet(f"{u}:1-5"))
    assert not GtidSet(f"{u}:7").is_contained_within(GtidSet(f"{u}:1-5"))
    assert GtidSet("").is_contained_within(GtidSet(f"{u}:1"))
    with pytest.raises(ValueError):
        GtidSet("not-a-uuid:1-5")
    with pytest.raises(ValueError):
        GtidSet(f"{u}:5-1")


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["bin.000001", "bin.000002", "BIN.000001"]),
            st.integers(0, 1 << 32),
            st.integers(0, 5),
            st.integers(0, 5),
        ),
        min_size=2,
        max_size=6,
    )
)
def test_binlog_comparator_is_total_order(tuples):
    """Antisymmetry + agreement with the key tuple the decision tree
    reduces to for same-server no-GTID offsets."""
    offs = [
        BinlogOffset(f, p, events_to_skip=e, rows_to_skip=r)
        for f, p, e, r in tuples
    ]
    for a in offs:
        for b in offs:
            assert a.compare_to(b) == -b.compare_to(a)
    import functools

    by_cmp = sorted(
        offs, key=functools.cmp_to_key(lambda x, y: x.compare_to(y))
    )
    keys = [
        (o.filename.lower(), o.position, o._long("event"), o._long("row"))
        for o in by_cmp
    ]
    assert keys == sorted(keys)


# ------------------------------------------------------------------- lsn

def test_lsn_parse_format_compare():
    a = Lsn.parse("00000027:00000ac0:0002")
    b = Lsn.parse("00000027:00000ac0:0003")
    c = Lsn.parse("00000028:00000000:0000")
    assert str(a) == "00000027:00000ac0:0002"
    assert a.compare_to(b) < 0 < c.compare_to(b)
    assert a.compare_to(Lsn.parse("0000002700000ac00002")) == 0  # colon-free
    assert not Lsn.parse(None).available and not Lsn.parse("NULL").available
    assert Lsn.parse("00000000:00000000:0000").available is False
    with pytest.raises(ValueError):
        Lsn.parse("zz")


def test_lsn_offset_commit_then_change():
    x = LsnOffset("00000027:00000ac0:0002", "00000027:00000aa0:0001", 1)
    y = LsnOffset("00000027:00000ac0:0002", "00000027:00000ab0:0001", 1)
    z = LsnOffset("00000028:00000000:0001", "00000000:00000001:0000", 1)
    assert x.is_before(y)  # same commit LSN -> change LSN decides
    assert y.is_before(z)  # commit LSN dominates
    assert x.compare_to(x) == 0
    # sentinels (LsnOffset.java:32-35: 1-byte arrays)
    assert INITIAL_LSN.is_at_or_before(x) and x.is_before(NO_STOPPING_LSN)
    assert NO_STOPPING_LSN.is_after(z)


# ----------------------------------------------------------- changestream

def _token(t: int, i: int) -> str:
    return "82" + t.to_bytes(4, "big").hex() + i.to_bytes(4, "big").hex()


def test_resume_token_decode():
    # KeyString marker 130 + 4-byte seconds + 4-byte increment, BE
    # (ResumeToken.java:38-63)
    assert decode_resume_token_timestamp(_token(1700000000, 7)) == (
        (1700000000 << 32) | 7
    )
    with pytest.raises(ValueError):
        decode_resume_token_timestamp("7b" + "00" * 8)  # wrong marker
    with pytest.raises(ValueError):
        decode_resume_token_timestamp("82" + "00" * 4)  # too short


def test_change_stream_offset_order():
    a = ChangeStreamOffset(resume_token_data=_token(100, 1))
    b = ChangeStreamOffset(resume_token_data=_token(100, 2))
    c = ChangeStreamOffset(timestamp=(101 << 32) | 0)
    assert a.is_before(b) and b.is_before(c)
    assert c.is_before(NO_STOPPING_CHANGE_STREAM)
    assert a.compare_to(None) == -1  # reference quirk (:92-94)
    assert a.offset["resumeToken"] == _token(100, 1)


# ------------------------------------------- specific-offset resolve e2e

def _dbz(i, file, pos, path):
    return json.dumps({
        "before": None, "op": "c", "ts_ms": 1000 + i,
        "after": {"repo": "o/r", "path": path, "commit": f"c{i}",
                  "lang": "py", "content": f"v{i}"},
        "source": {"table": "repos", "db": "d", "seq": i,
                   "file": file, "pos": pos},
    })


def test_specific_offset_startup_and_stop(spark, tmp_path):
    """A mysqlcdc-shaped .conf with startup.mode = specific_offset and a
    stop.specific-offset pair: only events at-or-after the start binlog
    coordinates and strictly before the stop coordinates land. Reference:
    SourceOptions.java:55-66 (startup), :80-91 (stop); the binlog task
    self-terminates at the stop offset
    (MySqlBinlogFetchTask.handleEvent:138-163)."""
    from seatunnel_spark.config import run_job
    from seatunnel_spark.lake.table import LakeTable

    lines = []
    for i in range(10):
        file = "mysql-bin.000001" if i < 5 else "mysql-bin.000002"
        pos = 4 + 100 * (i % 5)
        lines.append(_dbz(i, file, pos, f"p{i}.py"))
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    with open(os.path.join(topic, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    root = str(tmp_path / "lake")
    config = {
        "env": {"job.mode": "STREAMING", "job.timeout.s": 300},
        "source": [{
            "plugin": "CdcChangelog",
            "topic_dir": topic,
            "format": "debezium-json",
            "schema": {"fields": {
                "repo": "string", "path": "string", "commit": "string",
                "lang": "string", "content": "string",
            }},
            "startup.mode": "specific_offset",
            # first at-or-after = seq 6 (file 2, pos 104)
            "startup.specific-offset.file": "mysql-bin.000002",
            "startup.specific-offset.pos": 104,
            # first at-or-after = seq 8 (pos 304) -> stop_seq 7
            "stop.specific-offset.file": "mysql-bin.000002",
            "stop.specific-offset.pos": 304,
        }],
        "sink": [{
            "plugin": "LakeTable", "root": root,
            "primary_keys": ["repo", "path"], "num_buckets": 2,
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }],
    }
    run_job(spark, config)
    got = sorted(
        r["path"] for r in LakeTable.load(root).scan(spark).collect()
    )
    assert got == ["p6.py", "p7.py"]


def test_specific_offset_refused_off_debezium_wire(spark, tmp_path):
    from seatunnel_spark.streaming.job import CdcIngestJob

    os.makedirs(tmp_path / "t2")
    job = CdcIngestJob(
        spark, str(tmp_path / "lake2"), str(tmp_path / "t2"),
        str(tmp_path / "c2"), wire_format="canal-json",
    )
    with pytest.raises(ValueError, match="debezium-json"):
        job.resolve_specific_offset(BinlogOffset("f", 0))
