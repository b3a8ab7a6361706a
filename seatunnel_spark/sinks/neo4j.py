"""Neo4j sink — cypher seam: render the parameterized queries the
reference writer runs (per-row mode: the user's cypher with
``queryParamPosition`` bindings; batch mode: the same cypher with a
``$batch`` list parameter, the UNWIND idiom). Bolt is a binary protocol
→ dry_run-only config sink; the rendered (query, parameters) pairs run
verbatim through any Neo4j driver or cypher-shell ``:param``.

Reference: connector-neo4j ``sink/Neo4jSinkWriter.java`` — one-by-one
mode binds each configured parameter name to a row field by position;
batch mode buffers rows and binds them as the ``batch`` parameter of a
single query (``CypherEnum.BATCH``), flushed at max_batch_size.
"""

from __future__ import annotations


def row_queries(
    rows: list[dict],
    query: str,
    query_param_position: dict[str, int],
    columns: list[str],
) -> list[tuple[str, dict]]:
    """One-by-one mode: (query, {param: row[column-at-position]}) per row."""
    for p, idx in query_param_position.items():
        if not (0 <= int(idx) < len(columns)):
            raise ValueError(
                f"queryParamPosition[{p!r}] = {idx} out of range for {columns}"
            )
    return [
        (query, {p: r.get(columns[int(idx)])
                 for p, idx in query_param_position.items()})
        for r in rows
    ]


def batch_queries(
    rows: list[dict],
    query: str,
    columns: list[str],
    max_batch_size: int = 500,
) -> list[tuple[str, dict]]:
    """Batch mode: the cypher runs once per flush with ``$batch`` bound to
    the buffered row maps (the ``UNWIND $batch AS row ...`` idiom)."""
    if "$batch" not in query:
        raise ValueError("batch-mode cypher must reference $batch "
                         "(e.g. UNWIND $batch AS row ...)")
    out = []
    for i in range(0, len(rows), int(max_batch_size)):
        chunk = [{c: r.get(c) for c in columns} for r in rows[i : i + max_batch_size]]
        out.append((query, {"batch": chunk}))
    return out


def queries_for_batch(
    df,
    query: str,
    query_param_position: dict[str, int] | None = None,
    max_batch_size: int = 500,
) -> list[tuple[str, dict]]:
    cols = [c for c in df.columns if c not in ("op", "seq")]
    rows = [r.asDict() for r in df.select(*cols).collect()]
    if query_param_position:
        return row_queries(rows, query, query_param_position, cols)
    return batch_queries(rows, query, cols, max_batch_size)
