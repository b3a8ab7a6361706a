"""Zeta SQL scalar function library → Spark built-ins.

The reference ships ~80 row-at-a-time Java scalar functions
(seatunnel-transforms-v2 sql/zeta/ZetaSQLFunction.java constants; impls in
sql/zeta/functions/{String,Numeric,DateTime,System}Function.java). Every one
maps to a JVM-side, codegen'd Spark expression — no Python in the hot path
(except STRINGDECODE/STRINGENCODE, see sql_engine._ensure_zeta_udfs).

``rewrite_zeta_expr`` is an argument-aware recursive rewriter: it tokenizes
the expression (respecting strings/quoted identifiers/nested parens),
rewrites every function call bottom-up, and applies one of:
  - pass-through (name + semantics identical in Spark SQL),
  - a rename (RENAMES),
  - an argument transform (TRANSFORMS — arg-order swaps, default args,
    composition templates for functions Spark lacks).

Known deviations (documented, reference file:line cited):
  - WEEK: the reference returns ISO weekOfYear()+1 (DateTimeFunction.java:
    526-534) which is off-by-one vs H2/ISO; we map to Spark WEEKOFYEAR
    (ISO week-of-week-based-year) — the standard value.
  - INSERT with NULL string args returns NULL (Spark CONCAT) instead of the
    other argument (StringFunction.java:159-196).
  - INSTR with a negative start (lastIndexOf mode) is unsupported.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# name-level mapping
# ---------------------------------------------------------------------------

# Zeta names whose Spark SQL name AND argument convention are identical.
PASSTHROUGH: frozenset[str] = frozenset(
    """
    ASCII BIT_LENGTH CHAR_LENGTH LENGTH OCTET_LENGTH CHAR CHR CONCAT CONCAT_WS
    LOWER LCASE UPPER UCASE LEFT RIGHT LOCATE POSITION LPAD RPAD LTRIM RTRIM
    TRIM REGEXP_REPLACE REGEXP_LIKE REGEXP_SUBSTR REPEAT REPLACE SOUNDEX SPACE
    SUBSTRING SUBSTR TRANSLATE
    ABS ACOS ASIN ATAN COS COSH COT SIN SINH TAN TANH ATAN2 MOD CEIL CEILING
    EXP FLOOR LN LOG LOG10 RADIANS SQRT PI POWER RAND ROUND SIGN
    COALESCE IFNULL NULLIF NVL CASE CAST EXTRACT
    CURRENT_DATE CURRENT_TIMESTAMP NOW TO_DATE
    YEAR MONTH HOUR MINUTE SECOND QUARTER
    IF IIF ISNULL GREATEST LEAST
    """.split()
)

# Zeta name → Spark SQL name (same argument order).
RENAMES: dict[str, str] = {
    "RANDOM": "RAND",
    "FORMATDATETIME": "DATE_FORMAT",     # (dt, javaPattern) — same order
    "PARSEDATETIME": "TO_TIMESTAMP",     # (str, javaPattern) — same order
    "WEEK": "WEEKOFYEAR",                # see module docstring deviation note
    "DAY_OF_WEEK": "DAYOFWEEK",
    "DAY_OF_MONTH": "DAYOFMONTH",
    "DAY_OF_YEAR": "DAYOFYEAR",
    "CURTIME": "CURRENT_TIMESTAMP",
    "LOCALTIME": "CURRENT_TIMESTAMP",
    "LOCALTIMESTAMP": "CURRENT_TIMESTAMP",
    "CURDATE": "CURRENT_DATE",
    "STRINGDECODE": "ZETA_STRINGDECODE",  # pandas UDF (no Spark builtin)
    "STRINGENCODE": "ZETA_STRINGENCODE",
}


def _strip_quotes(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    return s


# --- argument transforms: Zeta call → Spark SQL fragment ------------------

def _dateadd(a: list[str]) -> str:
    """DATEADD/TIMESTAMPADD(dt, count [, field='DAY']) →
    TIMESTAMPADD(field, count, dt)  (DateTimeFunction.java:53-139)."""
    field = _strip_quotes(a[2]).upper() if len(a) > 2 else "DAY"
    return f"TIMESTAMPADD({field}, {a[1]}, {a[0]})"


def _datediff(a: list[str]) -> str:
    """DATEDIFF(dt1, dt2 [, field='DAY']) = dt2 - dt1 in complete units
    (Duration.between(dt1, dt2), DateTimeFunction.java:141-216) →
    TIMESTAMPDIFF(field, dt1, dt2)."""
    field = _strip_quotes(a[2]).upper() if len(a) > 2 else "DAY"
    return f"TIMESTAMPDIFF({field}, {a[0]}, {a[1]})"


def _date_trunc(a: list[str]) -> str:
    """DATE_TRUNC(dt [, field='DAY']) → DATE_TRUNC(field, dt) — the reference
    puts the datetime first (DateTimeFunction.java:218-274); Spark reverses."""
    field = _strip_quotes(a[1]).upper() if len(a) > 1 else "DAY"
    return f"DATE_TRUNC('{field}', {a[0]})"


def _insert(a: list[str]) -> str:
    """INSERT(s, start, length, replacement) — H2 splice
    (StringFunction.java:159-196)."""
    s, pos, ln, r = a
    return (
        f"CONCAT(SUBSTRING({s}, 1, ({pos}) - 1), {r}, "
        f"SUBSTRING({s}, ({pos}) + ({ln})))"
    )


def _instr(a: list[str]) -> str:
    """INSTR(s, search [, start]) (StringFunction.java:239-253). 2-arg maps
    directly; 3-arg (positive start) becomes LOCATE(search, s, start)."""
    if len(a) == 2:
        return f"INSTR({a[0]}, {a[1]})"
    return f"LOCATE({a[1]}, {a[0]}, {a[2]})"


def _to_char(a: list[str]) -> str:
    """TO_CHAR(x) → string; TO_CHAR(datetime, fmt) → DATE_FORMAT
    (StringFunction.java:621-633 delegates to formatdatetime)."""
    if len(a) == 1:
        return f"CAST({a[0]} AS STRING)"
    return f"DATE_FORMAT({a[0]}, {a[1]})"


def _trunc(a: list[str]) -> str:
    """TRUNC/TRUNCATE(x [, digits=0]): numeric truncation toward zero
    (NumericFunction.java:433-443, RoundingMode.DOWN). Spark only has the
    date TRUNC, so compose it; exact in integer space for digits<=0."""
    x = a[0]
    d = a[1] if len(a) > 1 else "0"
    p = f"POW(10, {d})"
    return (
        f"(CASE WHEN ({x}) >= 0 THEN FLOOR(({x}) * {p}) "
        f"ELSE CEILING(({x}) * {p}) END / {p})"
    )


def _hextoraw(a: list[str]) -> str:
    """HEXTORAW: 4 hex digits per UTF-16 code unit (StringFunction.java:111-127)
    == UTF-16BE decode."""
    return f"DECODE(UNHEX({a[0]}), 'UTF-16BE')"


def _rawtohex(a: list[str]) -> str:
    """RAWTOHEX of a string: each char → 4 lowercase hex digits
    (StringFunction.java:129-157) == UTF-16BE encode."""
    return f"LOWER(HEX(ENCODE({a[0]}, 'UTF-16BE')))"


def _dayname(a: list[str]) -> str:
    """DAYNAME → full English day name (DateTimeFunction.java:276-291)."""
    return f"DATE_FORMAT({a[0]}, 'EEEE')"


def _monthname(a: list[str]) -> str:
    """MONTHNAME → full English month name (DateTimeFunction.java:463-471)."""
    return f"DATE_FORMAT({a[0]}, 'MMMM')"


def _current_time(a: list[str]) -> str:
    """CURRENT_TIME — Spark has no TIME type; emit the HH:mm:ss string."""
    return "DATE_FORMAT(CURRENT_TIMESTAMP(), 'HH:mm:ss')"


TRANSFORMS: dict[str, callable] = {
    "DATEADD": _dateadd,
    "TIMESTAMPADD": _dateadd,
    "DATEDIFF": _datediff,
    "DATE_TRUNC": _date_trunc,
    "INSERT": _insert,
    "INSTR": _instr,
    "TO_CHAR": _to_char,
    "TRUNC": _trunc,
    "TRUNCATE": _trunc,
    "HEXTORAW": _hextoraw,
    "RAWTOHEX": _rawtohex,
    "DAYNAME": _dayname,
    "MONTHNAME": _monthname,
    "CURRENT_TIME": _current_time,
}

# every Zeta function name this library claims to cover (parity-tested)
ALL_ZETA_FUNCTIONS: frozenset[str] = (
    PASSTHROUGH
    | frozenset(RENAMES)
    | frozenset(TRANSFORMS)
) - {"IF", "IIF", "ISNULL", "GREATEST", "LEAST"}

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def rewrite_zeta_expr(expr: str) -> str:
    """Rewrite a Zeta SQL scalar expression into Spark SQL, recursively
    transforming every function call (argument-aware, string-safe)."""
    out = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c == "'":
            j = i + 1
            while j < n:
                if expr[j] == "'":
                    if j + 1 < n and expr[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(expr[i : j + 1])
            i = j + 1
            continue
        m = _IDENT.match(expr, i)
        if m:
            name = m.group(0)
            j = m.end()
            k = j
            while k < n and expr[k].isspace():
                k += 1
            if k < n and expr[k] == "(":
                args, close = _parse_args(expr, k)
                args = [rewrite_zeta_expr(a) for a in args]
                out.append(_emit(name, args))
                i = close + 1
                continue
            if name.upper() == "CURRENT_TIME":  # bare TimeKeyExpression
                out.append(_current_time([]))
            else:
                out.append(name)
            i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _parse_args(expr: str, open_paren: int) -> tuple[list[str], int]:
    """Split the balanced paren group starting at ``open_paren`` into
    top-level comma-separated args; returns (args, index_of_close_paren)."""
    depth = 0
    i, n = open_paren, len(expr)
    args, start = [], open_paren + 1
    while i < n:
        c = expr[i]
        if c == "'":
            j = i + 1
            while j < n:
                if expr[j] == "'":
                    if j + 1 < n and expr[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                tail = expr[start:i].strip()
                if tail or args:
                    args.append(tail)
                return args, i
        elif c == "," and depth == 1:
            args.append(expr[start:i].strip())
            start = i + 1
        i += 1
    raise ValueError(f"unbalanced parens in expression: {expr!r}")


def _emit(name: str, args: list[str]) -> str:
    u = name.upper()
    if u in TRANSFORMS:
        return TRANSFORMS[u](args)
    mapped = RENAMES.get(u, name)
    return f"{mapped}({', '.join(args)})"


def rewrite_zeta_sql(expr: str) -> str:
    """Back-compat alias (round-1 name)."""
    return rewrite_zeta_expr(expr)
