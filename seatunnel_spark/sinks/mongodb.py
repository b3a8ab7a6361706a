"""MongoDB sink — write-model seam: render the reference writer's ordered
bulk write as MongoDB DATABASE COMMANDS (the public `insert` / `update` /
`delete` command documents any driver or mongosh executes verbatim).

Reference: connector-mongodb ``serde/RowDataDocumentSerializer.java`` —
RowKind routing: with upsert enabled, I/+U → UpdateOneModel(filter,
{"$set": doc}, upsert=true); without, I → InsertOneModel(doc) and +U →
UpdateOneModel(filter, {"$set": doc}); D → DeleteOneModel(filter); the
writer skips UPDATE_BEFORE outright (``MongodbWriter.write``:98-100).
Filters equality-match the configured primary key fields
(``generateFilter``: Filters.and of Filters.eq per key).

Ordered-bulk batching groups CONSECUTIVE same-kind models into one
command — exactly how drivers split an ordered bulkWrite — so
cross-kind ordering (delete-then-insert of the same key) is preserved.

The mongo wire protocol is binary (OP_MSG): there is no honest
stdlib-only executable path, so the config sink is dry_run-only and says
so; a real deployment hands the same DataFrame to the Spark MongoDB
connector or these commands to any driver.
"""

from __future__ import annotations

import json


def write_models(
    rows: list[dict],
    columns: list[str],
    primary_keys: list[str],
    upsert: bool = True,
    op_col: str = "op",
) -> list[tuple[str, dict]]:
    """Rows → ordered (kind, model) list mirroring serializeToWriteModel.
    Kinds: "insert" (bare document), "update" (q/u[/upsert]), "delete"
    (q/limit 1). UPDATE_BEFORE rows are skipped."""
    if not primary_keys:
        raise ValueError("mongodb sink needs primary_keys for filters")
    out: list[tuple[str, dict]] = []
    for r in rows:
        op = r.get(op_col, "I")
        if op == "-U":
            continue  # MongodbWriter.write skips UPDATE_BEFORE
        doc = {c: r.get(c) for c in columns}
        q = {k: r.get(k) for k in primary_keys}
        if op == "D":
            out.append(("delete", {"q": q, "limit": 1}))
        elif upsert:
            out.append(("update", {"q": q, "u": {"$set": doc}, "upsert": True}))
        elif op == "U":
            out.append(("update", {"q": q, "u": {"$set": doc}}))
        else:
            out.append(("insert", doc))
    return out


def db_commands(
    models: list[tuple[str, dict]],
    collection: str,
) -> list[dict]:
    """Ordered bulk split: consecutive same-kind runs become one database
    command ({"insert": coll, "documents": [...]}, {"update": coll,
    "updates": [...]}, {"delete": coll, "deletes": [...]}), all with
    ordered: true."""
    key = {"insert": "documents", "update": "updates", "delete": "deletes"}
    cmds: list[dict] = []
    for kind, spec in models:
        if cmds and next(iter(cmds[-1])) == kind:
            cmds[-1][key[kind]].append(spec)
        else:
            cmds.append({kind: collection, key[kind]: [spec], "ordered": True})
    return cmds


def commands_for_batch(
    df,
    collection: str,
    primary_keys: list[str],
    upsert: bool = True,
    op_col: str = "op",
) -> list[dict]:
    """Collected-batch path: the DataFrame's rows (in order) as ordered
    bulk commands."""
    cols = [c for c in df.columns if c not in (op_col, "seq")]
    sel = cols + ([op_col] if op_col in df.columns else [])
    rows = [r.asDict() for r in df.select(*sel).collect()]
    return db_commands(
        write_models(rows, cols, primary_keys, upsert, op_col), collection
    )


def commands_as_json(cmds: list[dict]) -> str:
    """Canonical JSON rendering (one command per line) — assertable in
    tests, pasteable into mongosh via db.runCommand."""
    return "\n".join(json.dumps(c, separators=(",", ":")) for c in cmds)
