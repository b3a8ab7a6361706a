"""HTTP/REST source — the reference's connector-http-base surface
re-expressed for Spark.

Reference: connector-http-base ``source/HttpSourceReader.java`` (request →
optional content_field jsonpath cut → optional json_field columnwise
jsonpath zip → JSON/TEXT deserialize), ``config/HttpConfig.java`` (url /
method / headers / params / body / format / retry options /
enable_multi_lines / content_field / json_field). The derived connectors
(gitlab/jira/notion/...) are this base with canned urls+headers, so this
one module is the family's representative.

Execution model: a REST endpoint is a single logical stream, so a plain
request is fetched ON THE DRIVER (the reference reads it in one
AbstractSingleSplitReader too) and parallelized afterwards. The scale path
is ``pagination``: page numbers become a Spark range that ``mapInPandas``
fans out across executors — N pages fetch concurrently cluster-wide, each
executor parsing its own responses, and rows never gather on the driver.

Everything is stdlib (urllib) — no requests dependency.

The jsonpath evaluator implements the subset the reference's own e2e confs
use (``$.store.book[*].category``, ``$.store.book.*``, ``$.data[2].id``):
dot fields, [index], [*] and .* wildcards, with jayway's
SUPPRESS_EXCEPTIONS / leaf-to-null behavior (missing leaves yield None,
missing interior nodes yield no matches).
"""

from __future__ import annotations

import json
import re
import time
import urllib.error
import urllib.parse
import urllib.request

METHODS = ("GET", "POST", "PUT", "DELETE", "HEAD", "PATCH")

# --------------------------------------------------------------- jsonpath
_TOKEN_RX = re.compile(r"\.([A-Za-z_][\w\-]*)|\[(\d+)\]|\[\*\]|\.\*")


def _tokenize(path: str) -> list:
    if not path.startswith("$"):
        raise ValueError(f"jsonpath must start with $: {path!r}")
    rest, pos, tokens = path[1:], 0, []
    while pos < len(rest):
        m = _TOKEN_RX.match(rest, pos)
        if not m:
            raise ValueError(f"unsupported jsonpath segment at {rest[pos:]!r} in {path!r}")
        if m.group(1) is not None:
            tokens.append(m.group(1))
        elif m.group(2) is not None:
            tokens.append(int(m.group(2)))
        else:
            tokens.append("*")
        pos = m.end()
    return tokens


def jsonpath_values(obj, path: str) -> list:
    """All matches of ``path`` in ``obj`` (jayway ALWAYS_RETURN_LIST +
    SUPPRESS_EXCEPTIONS semantics): a missing LEAF yields None, a missing
    interior node yields no match."""
    nodes = [obj]
    tokens = _tokenize(path)
    for i, tok in enumerate(tokens):
        leaf = i == len(tokens) - 1
        nxt = []
        for cur in nodes:
            if tok == "*":
                if isinstance(cur, dict):
                    nxt.extend(cur.values())
                elif isinstance(cur, list):
                    nxt.extend(cur)
            elif isinstance(tok, int):
                if isinstance(cur, list) and tok < len(cur):
                    nxt.append(cur[tok])
                elif leaf:
                    nxt.append(None)
            else:
                if isinstance(cur, dict) and tok in cur:
                    nxt.append(cur[tok])
                elif leaf:
                    nxt.append(None)
        nodes = nxt
    return nodes


# ----------------------------------------------------------------- fetch
def fetch_http(
    url: str,
    method: str = "GET",
    headers: dict | None = None,
    params: dict | None = None,
    body: str | None = None,
    retry: int = 0,
    retry_backoff_multiplier_ms: int = 100,
    retry_backoff_max_ms: int = 10_000,
    timeout_s: float = 30.0,
) -> str:
    """One HTTP exchange with the reference's bounded exponential backoff
    (HttpConfig RETRY / RETRY_BACKOFF_MULTIPLIER_MS / RETRY_BACKOFF_MAX_MS).
    Returns the response body; raises after ``retry`` + 1 failed attempts.
    Non-2xx responses count as failures (HttpSourceReader logs and yields
    no rows on non-200; here bounded jobs fail loudly instead of silently
    producing an empty table)."""
    method = method.upper()
    if method not in METHODS:
        raise ValueError(f"unknown http method {method!r}")
    if params:
        sep = "&" if "?" in url else "?"
        url = url + sep + urllib.parse.urlencode(params)
    data = body.encode() if body is not None else None
    last_err: Exception | None = None
    for attempt in range(int(retry) + 1):
        if attempt:
            delay = min(
                retry_backoff_multiplier_ms * (2 ** (attempt - 1)),
                retry_backoff_max_ms,
            )
            time.sleep(delay / 1000.0)
        try:
            req = urllib.request.Request(url, data=data, method=method)
            for k, v in (headers or {}).items():
                req.add_header(k, str(v))
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return resp.read().decode("utf-8", errors="replace")
        except (urllib.error.URLError, urllib.error.HTTPError, OSError) as e:
            last_err = e
    raise ConnectionError(f"http fetch failed after {int(retry) + 1} attempts: {last_err}")


# ----------------------------------------------------------------- parse
def rows_from_response(
    content: str,
    field_names: list[str],
    fmt: str = "json",
    content_field: str | None = None,
    json_field: dict[str, str] | None = None,
    enable_multi_lines: bool = False,
) -> list[dict]:
    """Response text → list of row dicts keyed by ``field_names`` —
    HttpSourceReader.collect's pipeline: multi-line split, content_field
    cut, json_field columnwise zip (with the reference's loud
    length-consistency check), then JSON/TEXT row extraction."""
    if fmt not in ("json", "text"):
        raise ValueError(f"unknown http format {fmt!r}")
    if fmt == "text":
        lines = content.splitlines() if enable_multi_lines else [content]
        col = field_names[0]
        return [{col: ln} for ln in lines if ln != ""]

    chunks = (
        [ln for ln in content.splitlines() if ln.strip()]
        if enable_multi_lines
        else [content]
    )
    rows: list[dict] = []
    for chunk in chunks:
        doc = json.loads(chunk)
        if json_field:
            cols = {name: jsonpath_values(doc, p) for name, p in json_field.items()}
            sizes = {name: len(v) for name, v in cols.items()}
            if len(set(sizes.values())) > 1:
                # HttpConnectorErrorCode.FIELD_DATA_IS_INCONSISTENT
                raise ValueError(
                    f"json_field paths matched inconsistent record counts: {sizes}"
                )
            n = next(iter(sizes.values()), 0)
            rows.extend(
                {name: cols[name][i] for name in json_field} for i in range(n)
            )
            continue
        if content_field:
            part = jsonpath_values(doc, content_field)
            # a path ending in a concrete node returns [node]; unwrap a
            # single list node to its elements (the $.store.book case)
            if len(part) == 1 and isinstance(part[0], list):
                part = part[0]
            doc = part
        if isinstance(doc, list):
            rows.extend(doc)
        else:
            rows.append(doc)
    out = []
    for r in rows:
        if not isinstance(r, dict):
            raise ValueError(f"http row is not a JSON object: {r!r}")
        out.append({name: _plain(r.get(name)) for name in field_names})
    return out


def _plain(v):
    """JSON value → schema-friendly scalar: nested structures render as
    canonical JSON text (the declared column type does the cast)."""
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return v


# ------------------------------------------------------------- DataFrame
def _schema_ddl(fields: dict[str, str]) -> str:
    return ", ".join(f"{n} {t}" for n, t in fields.items())


def read_http_source(spark, opts: dict):
    """Config-shaped HTTP read → DataFrame. ``opts`` carries the reference
    option names (url, method, headers, params, body, format, schema,
    content_field, json_field, enable_multi_lines, retry,
    retry_backoff_multiplier_ms, retry_backoff_max_ms) plus ``pagination``::

        pagination {
          page_field = "page"      # request param that carries the page no
          start = 1
          total_pages = 40         #   known page count -> DISTRIBUTED fetch
          # or: max_pages = 1000   #   unknown count -> driver loop, stops
          #                            at the first empty page
        }

    With ``total_pages`` the page numbers become a Spark range fanned out
    via ``mapInPandas`` — each executor fetches and parses its own pages
    concurrently; rows never pass through the driver. Without pagination a
    single request is fetched on the driver (one REST response is one
    logical split — the reference reads it single-split too) and
    parallelized from local memory."""
    fields = (opts.get("schema") or {}).get("fields") or {}
    if not fields:
        raise ValueError("Http source needs schema.fields")
    if opts.get("format", "json") == "text" and len(fields) != 1:
        raise ValueError("format=text needs exactly one schema field")
    field_names = list(fields)
    ddl = _schema_ddl(fields)
    fetch_kw = dict(
        method=opts.get("method", "GET"),
        headers=opts.get("headers"),
        body=opts.get("body"),
        retry=int(opts.get("retry", 0)),
        retry_backoff_multiplier_ms=int(opts.get("retry_backoff_multiplier_ms", 100)),
        retry_backoff_max_ms=int(opts.get("retry_backoff_max_ms", 10_000)),
        timeout_s=float(opts.get("timeout_s", 30.0)),
    )
    parse_kw = dict(
        fmt=opts.get("format", "json"),
        content_field=opts.get("content_field"),
        json_field=opts.get("json_field"),
        enable_multi_lines=bool(opts.get("enable_multi_lines", False)),
    )
    url = opts["url"]
    params = dict(opts.get("params") or {})
    pg = opts.get("pagination")

    if pg and pg.get("total_pages") is not None:
        page_field = pg.get("page_field", "page")
        start = int(pg.get("start", 1))
        total = int(pg["total_pages"])

        def fetch_pages(batches):
            import pandas as pd

            for pdf in batches:
                rows: list[dict] = []
                for page in pdf["id"]:
                    content = fetch_http(
                        url, params={**params, page_field: int(page)}, **fetch_kw
                    )
                    rows.extend(rows_from_response(content, field_names, **parse_kw))
                yield pd.DataFrame(rows, columns=field_names)

        pages = spark.range(start, start + total).repartition(
            min(total, spark.sparkContext.defaultParallelism)
        )
        return pages.mapInPandas(fetch_pages, ddl)

    if pg:
        # unknown page count: sequential driver loop to the first empty page
        page_field = pg.get("page_field", "page")
        page = int(pg.get("start", 1))
        max_pages = int(pg.get("max_pages", 1000))
        all_rows: list[dict] = []
        for _ in range(max_pages):
            content = fetch_http(url, params={**params, page_field: page}, **fetch_kw)
            rows = rows_from_response(content, field_names, **parse_kw)
            if not rows:
                break
            all_rows.extend(rows)
            page += 1
        return spark.createDataFrame(
            [tuple(r[n] for n in field_names) for r in all_rows], ddl
        )

    content = fetch_http(url, params=params or None, **fetch_kw)
    rows = rows_from_response(content, field_names, **parse_kw)
    return spark.createDataFrame(
        [tuple(r[n] for n in field_names) for r in rows], ddl
    )
