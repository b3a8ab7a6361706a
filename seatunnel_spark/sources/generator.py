"""Deterministic seeded fixture generator (the engine's FakeSource).

Mirrors the reference's test-data strategy — a synthetic source generating
rows from a declared schema (reference: connector-fake FakeDataGenerator.java,
167 LoC) plus the e2e change-stream DDL/DML interleavings of
connector-cdc-mysql-e2e (MysqlCDCIT.java:210-245) — adapted to the BASELINE
input shape: a table of source-code repositories keyed on (repo, path) and a
binlog/WAL-style event log with interleaved DDL.

Everything is a pure function of (seed, index) via md5, so the pandas oracle
(oracle.py) reproduces the exact same bytes with zero shared state. Content
is one md5 per row (cheap at 10^7-event bench scale).

Key-space skew is Zipf-ish (a few hot repos own most events) to exercise the
salting / AQE-skew paths the north rule demands.
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from seatunnel_spark.schema import OP_DDL, OP_DELETE, OP_INSERT, OP_UPDATE, SchemaChange

N_REPOS = 40
LANGS = ["py", "java", "go", "rs", "ts", "md"]
EPOCH0 = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _h(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _u(s: str) -> float:
    """Deterministic uniform [0,1) from a string."""
    return int(_h(s)[:12], 16) / float(1 << 48)


def repo_for(rid: int) -> str:
    return f"org{rid % 8}/repo{rid}"


def key_for(i: int, seed: int) -> tuple[str, str, str]:
    """Key i → (repo, path, lang). Repo is Zipf-skewed: low ids are hot."""
    rid = int(N_REPOS * _u(f"{seed}|repo|{i}") ** 2.5)
    lang = LANGS[int(_u(f"{seed}|lang|{i}") * len(LANGS))]
    path = f"src/pkg{i % 97}/mod{i // 97}/file{i}.{lang}"
    return repo_for(rid), path, lang


def commit_for(repo: str, path: str, version: int) -> str:
    d = _h(f"c|{repo}|{path}|{version}")
    return (d + d)[:40]


def content_for(repo: str, path: str, version: int) -> str:
    """Deterministic pseudo-source text, 200–4000 chars, one md5 per call."""
    d = _h(f"b|{repo}|{path}|{version}")
    reps = 6 + int(d[:2], 16) % 115
    return f"// {repo}/{path} v{version}\n" + (d + "\n") * reps


def stars_for(repo: str, path: str, version: int) -> int:
    return int(_h(f"s|{repo}|{path}|{version}")[:4], 16)


def gen_base(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Initial snapshot state of the repos table (version 0 of keys 0..n)."""
    rows = []
    for i in range(n_rows):
        repo, path, lang = key_for(i, seed)
        rows.append(
            (repo, path, commit_for(repo, path, 0), lang, content_for(repo, path, 0))
        )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def ddl_schedule(n_events: int) -> dict[int, SchemaChange]:
    """DDL events at fixed offsets: add → rename → widen (FIXTURES.md §2).

    Reference semantics: AlterTableAddColumnEvent / AlterTableChangeColumnEvent
    (rename) / AlterTableModifyColumnEvent (type change), applied at exact
    offsets per IncrementalSourceStreamFetcher.splitSchemaChangeStream:152-236.
    """
    if n_events < 20:
        return {}
    return {
        int(n_events * 0.40): SchemaChange(kind="add_column", name="stars", type="int"),
        int(n_events * 0.55): SchemaChange(
            kind="rename_column", old_name="commit", name="commit_sha"
        ),
        int(n_events * 0.70): SchemaChange(kind="widen_type", name="stars", type="bigint"),
    }


def gen_events(
    n_events: int,
    n_base: int,
    seed: int = 42,
    with_ddl: bool = True,
    txn_size: int = 20,
) -> pd.DataFrame:
    """Sequential change log: ~60% U (hot-key heavy), ~25% I, ~10% D
    (incl. delete-then-reinsert), ~5% same-key churn, + DDL at fixed offsets.

    Deterministic given (n_events, n_base, seed). The live key set evolves as
    we generate, exactly as a real binlog would.
    """
    ddls = ddl_schedule(n_events) if with_ddl else {}
    versions: dict[int, int] = {}  # key index -> latest version (live keys)
    deleted: list[int] = []
    next_key = n_base
    has_stars = False
    rows = []
    for s in range(n_events):
        if s in ddls:
            ev = ddls[s]
            if ev.kind == "add_column":
                has_stars = True
            rows.append(
                (s, s // txn_size, OP_DDL, None, None, None, None, None, ev.to_json(), None,
                 EPOCH0 + timedelta(seconds=s))
            )
            continue
        u = _u(f"{seed}|op|{s}")
        live = len(versions) + n_base  # keys 0..n_base start live implicitly
        if u < 0.60 and live > 0:
            op = OP_UPDATE
            k = _pick_live(s, seed, n_base, versions, deleted)
        elif u < 0.85:
            op = OP_INSERT
            # ~8% of inserts re-insert a previously deleted key (LWW edge case)
            if deleted and _u(f"{seed}|re|{s}") < 0.08:
                k = deleted[int(_u(f"{seed}|rk|{s}") * len(deleted))]
            else:
                k = next_key
                next_key += 1
        else:
            op = OP_DELETE
            k = _pick_live(s, seed, n_base, versions, deleted)

        repo, path, lang = key_for(k, seed)
        if op == OP_DELETE:
            if k in versions or k < n_base:
                deleted.append(k)
            versions.pop(k, None)
            if k < n_base:
                versions[k] = -1  # tombstone marker: base key no longer live
            rows.append(
                (s, s // txn_size, op, repo, path, None, None, None, None, None,
                 EPOCH0 + timedelta(seconds=s))
            )
        else:
            v = versions.get(k)
            v = 1 if v is None or v < 0 else v + 1
            versions[k] = v
            extra = (
                json.dumps({"stars": str(stars_for(repo, path, v))}) if has_stars else None
            )
            rows.append(
                (s, s // txn_size, op, repo, path, commit_for(repo, path, v), lang,
                 content_for(repo, path, v), None, extra, EPOCH0 + timedelta(seconds=s))
            )
    df = pd.DataFrame(
        rows,
        columns=["seq", "txn_id", "op", "repo", "path", "commit", "lang", "content",
                 "ddl", "extra", "ts"],
    )
    df["seq"] = df["seq"].astype("int64")
    df["txn_id"] = df["txn_id"].astype("int64")
    return df


def _pick_live(s: int, seed: int, n_base: int, versions: dict[int, int], deleted: list[int]) -> int:
    """Pick an existing key, Zipf-skewed toward low (hot) indices."""
    hi = n_base + len(versions)
    for attempt in range(4):
        k = int(hi * _u(f"{seed}|pick|{s}|{attempt}") ** 2.0)
        if versions.get(k, 0 if k < n_base else -1) >= 0:
            return k
    return 0 if versions.get(0, 0) >= 0 else max(
        (k for k, v in versions.items() if v >= 0), default=0
    )


def write_fixture(
    outdir: str,
    n_base: int,
    n_events: int,
    seed: int = 42,
    n_event_files: int = 8,
    with_ddl: bool = True,
) -> dict[str, str]:
    """Write base.parquet + events/chunk-*.parquet (contiguous seq ranges so a
    file stream delivers them roughly in order). Idempotent per parameter set.
    """
    os.makedirs(outdir, exist_ok=True)
    marker = os.path.join(outdir, "_FIXTURE")
    stamp = f"{n_base}|{n_events}|{seed}|{n_event_files}|{with_ddl}"
    base_path = os.path.join(outdir, "base.parquet")
    events_dir = os.path.join(outdir, "events")
    if os.path.exists(marker) and open(marker).read() == stamp:
        return {"base": base_path, "events": events_dir}
    base = gen_base(n_base, seed)
    base.to_parquet(base_path, index=False)
    events = gen_events(n_events, n_base, seed, with_ddl=with_ddl)
    os.makedirs(events_dir, exist_ok=True)
    for old in os.listdir(events_dir):
        os.remove(os.path.join(events_dir, old))
    # explicit arrow schema so all-null chunks keep string typing
    ev_schema = pa.schema(
        [
            ("seq", pa.int64()),
            ("txn_id", pa.int64()),
            ("op", pa.string()),
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("content", pa.string()),
            ("ddl", pa.string()),
            ("extra", pa.string()),
            ("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    bounds = np.linspace(0, len(events), n_event_files + 1, dtype=int)
    for f in range(n_event_files):
        chunk = events.iloc[bounds[f] : bounds[f + 1]]
        tbl = pa.Table.from_pandas(chunk, schema=ev_schema, preserve_index=False)
        pq.write_table(tbl, os.path.join(events_dir, f"chunk-{f:05d}.parquet"))
    with open(marker, "w") as fh:
        fh.write(stamp)
    return {"base": base_path, "events": events_dir}
