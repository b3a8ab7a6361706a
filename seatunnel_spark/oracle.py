"""Single-threaded pandas replay oracle.

This is the offline form of the reference's e2e equality check — after full
replay, sink state must equal source state row-by-row
(reference: connector-cdc-mysql-e2e MysqlCDCIT.java:134-167). The oracle
applies events strictly in ``seq`` order: I/U upsert by (repo, path), D
deletes, DDL mutates the schema (add → null-fill, rename → move values,
widen → cast), per AlterTableEventHandler.java:53-163 semantics.
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd

from seatunnel_spark.schema import OP_DDL, OP_DELETE, SchemaChange


def replay(base: pd.DataFrame, events: pd.DataFrame) -> tuple[pd.DataFrame, list[str]]:
    """Return (final_state_df, final_column_list). Deterministic, sequential."""
    cols = list(base.columns)  # repo, path, commit, lang, content
    state: dict[tuple[str, str], dict] = {}
    for r in base.itertuples(index=False):
        d = dict(zip(cols, r))
        state[(d["repo"], d["path"])] = d

    events = events.sort_values("seq")
    for e in events.itertuples(index=False):
        if e.op == OP_DDL:
            ch = SchemaChange.from_json(e.ddl)
            for sub in ch.changes if ch.kind == "batch" else (ch,):
                if sub.kind == "add_column":
                    if sub.name in cols:
                        continue
                    cols.append(sub.name)
                    for row in state.values():
                        row[sub.name] = None
                elif sub.kind == "rename_column":
                    cols[cols.index(sub.old_name)] = sub.name
                    for row in state.values():
                        row[sub.name] = row.pop(sub.old_name)
                elif sub.kind == "widen_type":
                    pass  # python ints are already wide; schema-level only
                elif sub.kind == "drop_column":
                    cols.remove(sub.name)
                    for row in state.values():
                        row.pop(sub.name, None)
                elif sub.kind == "rename_table":
                    pass  # metadata-only: row data is unaffected
            continue
        key = (e.repo, e.path)
        if e.op == OP_DELETE:
            state.pop(key, None)
            continue
        row = {c: None for c in cols}
        row["repo"], row["path"], row["lang"] = e.repo, e.path, e.lang
        row["content"] = e.content
        # the wire field "commit" binds to the same column id across renames
        row["commit_sha" if "commit_sha" in cols else "commit"] = e.commit
        if e.extra:
            for k, v in json.loads(e.extra).items():
                if k in cols:
                    row[k] = int(v)
        state[key] = row

    out = pd.DataFrame(list(state.values()), columns=cols)
    return out.sort_values(["repo", "path"]).reset_index(drop=True), cols


def content_sha(df: pd.DataFrame, col: str = "content") -> pd.Series:
    """Per-row sha256 of content — the BASELINE verification invariant."""
    return df[col].map(lambda s: hashlib.sha256(s.encode()).hexdigest() if s is not None else None)
