"""Zeta SQL string engine: parse, validate, and execute a SeaTunnel `sql`
transform config string on a DataFrame.

Reference: seatunnel-transforms-v2 sql/zeta/ZetaSQLEngine.java:99-157. The
reference parses the config's SQL with JSqlParser and *rejects* everything
beyond a single-table SELECT/WHERE: joins, sub-selects, schema-qualified or
aliased tables, GROUP BY, ORDER BY, LIMIT/OFFSET. Expressions are then
evaluated row-at-a-time by ZetaSQLFunction.java (~80 scalar functions).

Spark realization: the same validation surface (same rejection messages) on
a small hand-rolled tokenizer, then the select list and WHERE clause are
rewritten function-by-function into Spark SQL (functions/zeta.py holds the
name+argument mapping) and executed as ``df.selectExpr(...).where(...)`` —
every scalar stays a JVM codegen'd Catalyst expression; the whole row-at-a-
time Zeta interpreter is subsumed by whole-stage codegen.

The two H2 string-escape functions with no Spark builtin (STRINGDECODE /
STRINGENCODE, StringFunction.java:286-383) are registered lazily as Arrow-
batched pandas UDFs — the only Python in the surface, off the hot path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

from seatunnel_spark.functions.zeta import rewrite_zeta_expr


class ZetaSqlError(ValueError):
    """Validation failure — message parity with ZetaSQLEngine.validateSQL."""


_IDENT_RE = re.compile(r'[A-Za-z_][A-Za-z0-9_$]*|"[^"]*"|`[^`]*`')

# top-level clause keywords that terminate the FROM item
_CLAUSE_STARTS = {"WHERE", "GROUP", "ORDER", "LIMIT", "OFFSET", "HAVING", "UNION", "JOIN"}


def _tokens(sql: str):
    """Yield (kind, text, pos): kind in {str, ident, punct, ws}. Single-quoted
    strings honor '' escapes; double-quoted/backtick identifiers kept whole."""
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            j = i
            while j < n and sql[j].isspace():
                j += 1
            yield ("ws", sql[i:j], i)
            i = j
        elif c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            if j >= n:
                raise ZetaSqlError("SQL parse failed: unterminated string literal")
            yield ("str", sql[i : j + 1], i)
            i = j + 1
        elif c in '"`':
            j = sql.find(c, i + 1)
            if j < 0:
                raise ZetaSqlError("SQL parse failed: unterminated quoted identifier")
            yield ("ident", sql[i : j + 1], i)
            i = j + 1
        else:
            m = _IDENT_RE.match(sql, i)
            if m:
                yield ("ident", m.group(0), i)
                i = m.end()
            else:
                yield ("punct", c, i)
                i += 1


def parse_select(sql: str, table_name: str) -> tuple[list[str], str | None]:
    """Validate a Zeta `sql` config string and split it into
    (select_items, where_clause), both still in Zeta dialect.

    Raises ZetaSqlError with the reference's messages on anything beyond a
    single-table SELECT/WHERE (ZetaSQLEngine.validateSQL:99-157).
    """
    sql = sql.strip().rstrip(";").strip()
    toks = [(k, t, p) for k, t, p in _tokens(sql) if k != "ws"]
    if not toks or not (toks[0][0] == "ident" and toks[0][1].upper() == "SELECT"):
        raise ZetaSqlError("Only supported DQL(select) SQL")

    depth = 0
    from_pos = None  # token index of top-level FROM
    clause_pos: dict[str, int] = {}
    for idx, (k, t, _p) in enumerate(toks):
        if k == "punct":
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
        elif k == "ident" and idx > 0:
            if t.upper() == "SELECT":  # any nested SELECT, at any depth
                raise ZetaSqlError("Unsupported sub table syntax")
            if depth != 0:
                continue
            u = t.upper()
            if u == "FROM" and from_pos is None:
                from_pos = idx
            elif u in ("JOIN", "INNER", "OUTER", "CROSS") or (
                u in ("LEFT", "RIGHT") and idx + 1 < len(toks)
                and toks[idx + 1][1].upper() in ("JOIN", "INNER", "OUTER")
            ):
                raise ZetaSqlError("Unsupported table join syntax")
            elif u == "GROUP":
                raise ZetaSqlError("Unsupported GROUP BY syntax")
            elif u == "ORDER":
                raise ZetaSqlError("Unsupported ORDER BY syntax")
            elif u in ("LIMIT", "OFFSET"):
                raise ZetaSqlError("Unsupported LIMIT,OFFSET syntax")
            elif u in ("UNION", "INTERSECT", "EXCEPT", "HAVING"):
                raise ZetaSqlError("Unsupported SQL syntax")
            elif u == "WHERE":
                clause_pos["WHERE"] = idx
    if from_pos is None:
        raise ZetaSqlError("Unsupported SQL syntax")

    # --- FROM item: exactly one bare table named `table_name`
    i = from_pos + 1
    if i >= len(toks):
        raise ZetaSqlError("Unsupported SQL syntax")
    k, t, _ = toks[i]
    if k == "punct" and t == "(":
        raise ZetaSqlError("Unsupported sub table syntax")
    if k != "ident":
        raise ZetaSqlError("Unsupported SQL syntax")
    tname = t.strip('"`')
    i += 1
    if i < len(toks):
        k2, t2, _ = toks[i]
        if k2 == "punct" and t2 == ".":
            raise ZetaSqlError("Unsupported schema syntax")
        if k2 == "punct" and t2 == ",":
            raise ZetaSqlError("Unsupported table join syntax")
        if k2 == "ident" and t2.upper() not in _CLAUSE_STARTS:
            raise ZetaSqlError("Unsupported table alias name syntax")
        if k2 == "ident" and t2.upper() == "AS":
            raise ZetaSqlError("Unsupported table alias name syntax")
    if tname.lower() != table_name.lower():
        raise ZetaSqlError(f"Table name: {tname} not found")

    # --- split select list / where clause by source positions
    sel_start = toks[1][2] if len(toks) > 1 else len(sql)
    sel_end = toks[from_pos][2]
    select_src = sql[sel_start:sel_end]
    where_src = None
    if "WHERE" in clause_pos:
        w = clause_pos["WHERE"]
        where_src = sql[toks[w][2] + len("WHERE") :].strip()
        if not where_src:
            raise ZetaSqlError("Unsupported SQL syntax")

    items = _split_top_level(select_src)
    if not items:
        raise ZetaSqlError("Unsupported SQL syntax")
    return items, where_src


def _split_top_level(src: str) -> list[str]:
    """Split a select list on commas outside parens/strings."""
    items, depth, start = [], 0, 0
    for k, t, p in _tokens(src):
        if k == "punct":
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
            elif t == "," and depth == 0:
                items.append(src[start:p].strip())
                start = p + 1
    tail = src[start:].strip()
    if tail:
        items.append(tail)
    return [i for i in items if i]


_UDFS_REGISTERED: set[int] = set()


def _ensure_zeta_udfs(spark) -> None:
    """Register the two escape functions with no Spark builtin as pandas
    UDFs (Arrow-batched; StringFunction.java:286-383 semantics)."""
    key = id(spark)
    if key in _UDFS_REGISTERED:
        return
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def zeta_stringdecode(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else v.encode("utf-8").decode("unicode_escape")
        )

    @pandas_udf("string")
    def zeta_stringencode(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else v.encode("unicode_escape").decode("ascii").replace('"', '\\"')
        )

    spark.udf.register("ZETA_STRINGDECODE", zeta_stringdecode)
    spark.udf.register("ZETA_STRINGENCODE", zeta_stringencode)
    _UDFS_REGISTERED.add(key)


def zeta_sql_transform(df: DataFrame, sql: str, table_name: str) -> DataFrame:
    """Execute a SeaTunnel `sql` transform config string on ``df``.

    The user-facing entry point a SeaTunnel config ports to 1:1:

        transform { Sql { query = "SELECT a, UCASE(b) AS ub FROM t WHERE c > 1" } }
        →  zeta_sql_transform(df, query, table_name="t")

    Validation parity: ZetaSQLEngine.java:99-157. Function parity:
    functions/zeta.py (ZetaSQLFunction.java). Execution: selectExpr/where —
    pure Catalyst, whole-stage codegen.
    """
    items, where = parse_select(sql, table_name)
    rewritten = [rewrite_zeta_expr(i) for i in items]
    w = rewrite_zeta_expr(where) if where else None
    if any("ZETA_STRING" in r for r in rewritten + ([w] if w else [])):
        _ensure_zeta_udfs(df.sparkSession)
    out = df.selectExpr(*rewritten)
    return out.where(w) if w else out
