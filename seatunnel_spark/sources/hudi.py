"""Hudi COW snapshot source — native reimplementation of the reference's
read path.

Reference surface: ``connector-hudi`` ``source/HudiSource.java:84-91``
(cow-only guard — "Do not support hudi mor table yet!"), config keys
``table.path`` / ``table.type`` / ``conf.files`` (``config/
HudiSourceConfig.java``), and ``source/HudiSourceReader.java``, which
rides ``HoodieParquetInputFormat``. That input format's snapshot-query
semantics are what we reimplement natively: consult the ``.hoodie``
timeline for COMPLETED commits, keep only the LATEST base file per file
group at or below the last completed instant, and never expose files
written by inflight/requested (uncommitted) instants.

Hudi's copy-on-write table layout is publicly specified
(hudi.apache.org/tech-specs):

    table_path/.hoodie/                          timeline
        {instantTime}.commit                     completed commit
        {instantTime}.replacecommit              completed clustering/replace
        {instantTime}.commit.requested|.inflight in-progress (excluded)
    table_path/<partition dirs...>/
        {fileId}_{writeToken}_{instantTime}.parquet   base file

``fileId`` is a UUID-ish token (no ``_``), ``writeToken`` is the
``{taskPartition}-{stageId}-{attempt}`` triple, ``instantTime`` the
timeline timestamp that wrote the file. A COW *file group* is all base
files sharing (partition dir, fileId); each commit that updates rows in
a group rewrites the whole base file under the new instant, so snapshot
state = the max-committed-instant file per group.

Unlike the reference's row-at-a-time Hive RecordReader (every value
stringified via ``String.valueOf`` — HudiSourceReader.java:135-143), we
hand the selected base files to Spark's vectorized parquet reader, so
column pruning and predicate pushdown reach the scan and types survive.
At 100 TB the file-slice resolution is pure driver-side metadata (one
timeline listing + one file listing — the same work Hudi's own planner
does) and the data path is an ordinary distributed parquet scan.
"""

from __future__ import annotations

import json
import os
import re

# {fileId}_{writeToken}_{instantTime}.parquet ; fileId and writeToken
# never contain '_' (UUID-dash + "-<idx>" and "<p>-<s>-<a>"), so the
# 3-way split on '_' is exact.
_BASE_FILE_RE = re.compile(
    r"^(?P<file_id>[^_/]+)_(?P<write_token>[^_/]+)_(?P<instant>\d+)\.parquet$"
)

# completed-instant timeline files: {instant}.commit / {instant}.replacecommit
# (state suffixes .requested / .inflight mark uncommitted work)
_COMPLETED_RE = re.compile(r"^(?P<instant>\d+)\.(commit|replacecommit)$")


def _instant_key(instant: str) -> int:
    """Numeric ordering key for timeline instants. Hudi timelines upgraded
    across 0.10 mix 14-digit (second) and 17-digit (millisecond) instant
    formats; Hudi's own compatibility rule
    (HoodieInstantTimeGenerator.fixInstantTimeCompatibility) pads the old
    format with zero milliseconds before comparing, and lexicographic
    comparison of mixed widths picks the wrong winner. Mirror the pad +
    compare numerically."""
    return int(instant.ljust(17, "0") if len(instant) < 17 else instant)


def hudi_completed_instants(table_path: str) -> set[str]:
    """Instant times with a completed commit/replacecommit on the
    ``.hoodie`` timeline. Raises if the path is not a Hudi table (no
    ``.hoodie`` directory) — the reference fails the same way when
    ``HoodieParquetInputFormat`` finds no metadata."""
    timeline = os.path.join(table_path, ".hoodie")
    if not os.path.isdir(timeline):
        raise FileNotFoundError(
            f"{table_path} is not a Hudi table (no .hoodie timeline)"
        )
    out = set()
    for name in os.listdir(timeline):
        m = _COMPLETED_RE.match(name)
        if m:
            out.add(m.group("instant"))
    return out


def hudi_replaced_file_groups(table_path: str) -> set[tuple[str, str]]:
    """(partition-relative-path, fileId) groups obsoleted by completed
    replacecommits. A clustering / insert_overwrite commit writes new base
    files under NEW file ids and records the groups it replaces in the
    replacecommit metadata's ``partitionToReplaceFileIds`` map
    (HoodieReplaceCommitMetadata in the public table spec);
    ``HoodieParquetInputFormat``/``HoodieROTablePathFilter`` hide those
    groups from snapshot queries even though their latest base files are
    still on disk. An unparseable replacecommit raises loudly rather than
    silently returning duplicate/stale rows."""
    timeline = os.path.join(table_path, ".hoodie")
    replaced: set[tuple[str, str]] = set()
    for name in os.listdir(timeline):
        m = _COMPLETED_RE.match(name)
        if not m or not name.endswith(".replacecommit"):
            continue
        path = os.path.join(timeline, name)
        with open(path, "rb") as fh:
            body = fh.read()
        if not body.strip():
            # Hudi writes empty completed files for some actions; an empty
            # replacecommit replaces nothing
            continue
        try:
            meta = json.loads(body)
            part_map = meta.get("partitionToReplaceFileIds") or {}
            for partition, file_ids in part_map.items():
                for fid in file_ids or []:
                    replaced.add((partition, fid))
        except (ValueError, AttributeError) as exc:
            raise ValueError(
                f"cannot parse replacecommit metadata {path}: {exc}; "
                "refusing to return a snapshot that may contain replaced "
                "(stale/duplicate) file groups"
            ) from exc
    return replaced


def hudi_snapshot_files(table_path: str) -> list[str]:
    """Resolve the COW snapshot file slices: for every file group
    (partition dir, fileId), the base file with the max instantTime among
    COMPLETED instants — excluding groups obsoleted by a completed
    replacecommit. Files from uncommitted instants are invisible, exactly
    like ``HoodieROTablePathFilter``."""
    completed = hudi_completed_instants(table_path)
    replaced = hudi_replaced_file_groups(table_path)
    root = os.path.abspath(table_path)
    latest: dict[tuple[str, str], tuple[int, str]] = {}
    for dirpath, dirnames, filenames in os.walk(table_path):
        # never descend into metadata dirs (.hoodie and friends)
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        rel = os.path.relpath(os.path.abspath(dirpath), root)
        partition = "" if rel == "." else rel
        for name in filenames:
            m = _BASE_FILE_RE.match(name)
            if not m or m.group("instant") not in completed:
                continue
            if (partition, m.group("file_id")) in replaced:
                continue
            key = (dirpath, m.group("file_id"))
            cur = latest.get(key)
            ik = _instant_key(m.group("instant"))
            if cur is None or ik > cur[0]:
                latest[key] = (ik, os.path.join(dirpath, name))
    return sorted(path for _, path in latest.values())


def read_hudi(spark, table_path: str, table_type: str = "cow"):
    """Snapshot-read a Hudi COW table into a DataFrame.

    ``table_type='mor'`` is refused with the reference's message
    (HudiSource.java:84-91); an empty/parquet-less table raises its
    "has no parquet file" error (HudiSource.java:118-121)."""
    if table_type.lower() != "cow":
        raise ValueError("Do not support hudi mor table yet!")
    files = hudi_snapshot_files(table_path)
    if not files:
        raise FileNotFoundError(
            f"{table_path} has no parquet file, please check!"
        )
    return spark.read.parquet(*files)


def read_hudi_source(spark, block: dict):
    """Config plugin entry (``Hudi`` source block). Reference keys
    ``table.path`` (required), ``table.type`` (default cow — the
    reference requires it present and cow), ``conf.files`` (Hadoop conf
    XMLs — meaningless off-HDFS; accepted and ignored for local paths).
    Kerberos options need a real KDC and are refused loudly."""
    table_path = block.get("table.path") or block.get("table_path")
    if not table_path:
        raise ValueError("Hudi source needs table.path")
    if str(block.get("use.kerberos", block.get("use_kerberos", "false"))).lower() == "true":
        raise ValueError(
            "Kerberos auth needs a KDC + Hadoop UGI; not supported in the "
            "local filesystem reader"
        )
    table_type = block.get("table.type", block.get("table_type", "cow"))
    return read_hudi(spark, table_path, table_type=table_type)
