"""TDengine sink — SQL-over-REST seam: render the exact
``INSERT INTO {subtable} USING {stable} TAGS (...) VALUES (...)``
statements the reference writer executes, and the TDengine REST API
request (``POST {url}/rest/sql`` with basic auth — plain HTTP, so the
statements are executable with stdlib when a server exists).

Reference: connector-tdengine ``sink/TDengineSinkWriter.java`` — row
layout [subtable_name, metric..., tag...]: field 0 names the subtable,
the LAST ``tags_num`` fields are tag values, everything between is the
metric tuple; strings and timestamps quote, numbers pass bare.
"""

from __future__ import annotations

from seatunnel_spark.sinks.streamload import StreamLoadRequest, _basic_auth


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v) if isinstance(v, float) else str(v)
    return "'" + str(v).replace("'", "''") + "'"


def insert_statements(
    rows: list[dict],
    columns: list[str],
    stable: str,
    tags_num: int,
) -> list[str]:
    """Rows → one INSERT per row (the reference's statement shape):
    columns[0] = subtable name, trailing ``tags_num`` columns = tags,
    the middle columns = metric values."""
    if tags_num < 0 or tags_num >= len(columns) - 1:
        raise ValueError(
            f"tags_num {tags_num} leaves no metrics in {columns} "
            "(need [subtable, metric..., tag...])"
        )
    metric_cols = columns[1 : len(columns) - tags_num]
    tag_cols = columns[len(columns) - tags_num :]
    out = []
    for r in rows:
        sub = str(r.get(columns[0]))
        tags = ", ".join(_lit(r.get(c)) for c in tag_cols)
        vals = ", ".join(_lit(r.get(c)) for c in metric_cols)
        out.append(
            f"INSERT INTO {sub} USING {stable} TAGS ( {tags} ) VALUES ( {vals} );"
        )
    return out


def rest_sql_request(
    url: str,
    sql: str,
    username: str = "root",
    password: str = "taosdata",
    database: str | None = None,
) -> StreamLoadRequest:
    """TDengine REST API: POST {url}/rest/sql[/db] with the statement as
    the body and basic auth."""
    path = "/rest/sql" + (f"/{database}" if database else "")
    return StreamLoadRequest(
        url=url.rstrip("/") + path,
        method="POST",
        headers={"Authorization": _basic_auth(username, password)},
        body=sql,
    )


def requests_for_batch(
    df,
    url: str,
    stable: str,
    tags_num: int,
    username: str = "root",
    password: str = "taosdata",
    database: str | None = None,
) -> list[StreamLoadRequest]:
    cols = [c for c in df.columns if c not in ("op", "seq")]
    rows = [r.asDict() for r in df.select(*cols).collect()]
    return [
        rest_sql_request(url, sql, username, password, database)
        for sql in insert_statements(rows, cols, stable, tags_num)
    ]
