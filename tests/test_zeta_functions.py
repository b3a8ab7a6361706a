"""Executable parity for EVERY Zeta scalar function (ZetaSQLFunction.java).

One Zeta SQL string runs through the full engine (parse → validate →
rewrite → selectExpr) and every function's value is compared against a
DuckDB-computed oracle (or a hand-computed literal where DuckDB lacks the
function). Coverage is asserted against functions/zeta.ALL_ZETA_FUNCTIONS so
a newly-mapped name without a parity case fails the suite.
"""

import datetime
import math

import duckdb
import pandas as pd
import pytest

from seatunnel_spark.functions.sql_engine import zeta_sql_transform
from seatunnel_spark.functions.zeta import ALL_ZETA_FUNCTIONS

# (zeta function name, zeta expression, kind, oracle)
#   kind "sql": oracle is a DuckDB expression over the same row
#   kind "lit": oracle is a Python literal (DuckDB lacks the function)
#   kind "exec": no stable value (random/clock) — assert non-null only
CASES = [
    # ---- string functions (StringFunction.java)
    ("ASCII", "ASCII(s)", "sql", "ascii(s)"),
    ("BIT_LENGTH", "BIT_LENGTH(s)", "sql", "bit_length(s)"),
    ("CHAR_LENGTH", "CHAR_LENGTH(s)", "sql", "length(s)"),
    ("LENGTH", "LENGTH(s)", "sql", "length(s)"),
    ("OCTET_LENGTH", "OCTET_LENGTH(s)", "sql", "octet_length(s::BLOB)"),
    ("CHAR", "CHAR(66)", "sql", "chr(66)"),
    ("CHR", "CHR(67)", "sql", "chr(67)"),
    ("CONCAT", "CONCAT(s, '!', s2)", "sql", "s || '!' || s2"),
    ("CONCAT_WS", "CONCAT_WS('-', s, s2)", "sql", "concat_ws('-', s, s2)"),
    ("HEXTORAW", "HEXTORAW(hexs)", "lit", "ab"),
    ("RAWTOHEX", "RAWTOHEX('ab')", "lit", "00610062"),
    ("INSERT", "INSERT(s, 2, 3, 'XY')", "lit", "HXYo World"),
    ("LOWER", "LOWER(s)", "sql", "lower(s)"),
    ("LCASE", "LCASE(s)", "sql", "lower(s)"),
    ("UPPER", "UPPER(s)", "sql", "upper(s)"),
    ("UCASE", "UCASE(s)", "sql", "upper(s)"),
    ("LEFT", "LEFT(s, 4)", "sql", "left(s, 4)"),
    ("RIGHT", "RIGHT(s, 4)", "sql", "right(s, 4)"),
    ("LOCATE", "LOCATE('o', s)", "sql", "strpos(s, 'o')"),
    ("INSTR", "INSTR(s, 'o', 6)", "lit", 8),
    ("POSITION", "POSITION('lo' IN s)", "sql", "position('lo' IN s)"),
    ("LPAD", "LPAD(s2, 6, '*')", "sql", "lpad(s2, 6, '*')"),
    ("RPAD", "RPAD(s2, 6, '*')", "sql", "rpad(s2, 6, '*')"),
    ("LTRIM", "LTRIM(pad)", "sql", "ltrim(pad)"),
    ("RTRIM", "RTRIM(pad)", "sql", "rtrim(pad)"),
    ("TRIM", "TRIM(pad)", "sql", "trim(pad)"),
    ("REGEXP_REPLACE", "REGEXP_REPLACE(s, 'l+', 'L')", "sql",
     "regexp_replace(s, 'l+', 'L', 'g')"),
    ("REGEXP_LIKE", "REGEXP_LIKE(s, 'W.rld')", "sql", "regexp_matches(s, 'W.rld')"),
    ("REGEXP_SUBSTR", "REGEXP_SUBSTR(s, '[A-Z][a-z]+')", "sql",
     "regexp_extract(s, '[A-Z][a-z]+', 0)"),
    ("REPEAT", "REPEAT(s2, 3)", "sql", "repeat(s2, 3)"),
    ("REPLACE", "REPLACE(s, 'l', 'L')", "sql", "replace(s, 'l', 'L')"),
    ("SOUNDEX", "SOUNDEX('Robert')", "lit", "R163"),
    ("SPACE", "SPACE(3)", "sql", "repeat(' ', 3)"),
    ("SUBSTRING", "SUBSTRING(s, 2, 3)", "sql", "substring(s, 2, 3)"),
    ("SUBSTR", "SUBSTR(s, 2, 3)", "sql", "substring(s, 2, 3)"),
    ("TO_CHAR", "TO_CHAR(ts, 'yyyy-MM-dd HH:mm:ss')", "sql",
     "strftime(ts, '%Y-%m-%d %H:%M:%S')"),
    ("TRANSLATE", "TRANSLATE(s, 'lo', '01')", "lit", "He001 W1r0d"),
    ("STRINGDECODE", r"STRINGDECODE('a\\nb')", "lit", "a\nb"),
    ("STRINGENCODE", "STRINGENCODE('a\nb')", "lit", "a\\nb"),
    # ---- numeric functions (NumericFunction.java)
    ("ABS", "ABS(m)", "sql", "abs(m)"),
    ("ACOS", "ACOS(0.5)", "sql", "acos(0.5)"),
    ("ASIN", "ASIN(0.5)", "sql", "asin(0.5)"),
    ("ATAN", "ATAN(0.5)", "sql", "atan(0.5)"),
    ("ATAN2", "ATAN2(2, 3)", "sql", "atan2(2, 3)"),
    ("COS", "COS(n)", "sql", "cos(n)"),
    ("COSH", "COSH(1.2)", "sql", "(exp(1.2) + exp(-1.2)) / 2"),
    ("SINH", "SINH(1.2)", "sql", "(exp(1.2) - exp(-1.2)) / 2"),
    ("TANH", "TANH(1.2)", "sql",
     "(exp(1.2) - exp(-1.2)) / (exp(1.2) + exp(-1.2))"),
    ("COT", "COT(1.2)", "sql", "1 / tan(1.2)"),
    ("SIN", "SIN(n)", "sql", "sin(n)"),
    ("TAN", "TAN(n)", "sql", "tan(n)"),
    ("MOD", "MOD(i, j)", "sql", "mod(i, j)"),
    ("CEIL", "CEIL(n)", "sql", "ceil(n)"),
    ("CEILING", "CEILING(n)", "sql", "ceil(n)"),
    ("EXP", "EXP(1.5)", "sql", "exp(1.5)"),
    ("FLOOR", "FLOOR(n)", "sql", "floor(n)"),
    ("LN", "LN(n)", "sql", "ln(n)"),
    ("LOG", "LOG(2, 8)", "sql", "log(2, 8)"),
    ("LOG10", "LOG10(n)", "sql", "log10(n)"),
    ("RADIANS", "RADIANS(180)", "sql", "radians(180)"),
    ("SQRT", "SQRT(n)", "sql", "sqrt(n)"),
    ("PI", "PI()", "sql", "pi()"),
    ("POWER", "POWER(i, 2)", "sql", "power(i, 2)"),
    ("ROUND", "ROUND(n, 1)", "sql", "round(n, 1)"),
    ("SIGN", "SIGN(m)", "sql", "sign(m)"),
    ("TRUNC", "TRUNC(m, 1)", "sql",
     "(CASE WHEN m >= 0 THEN floor(m * pow(10, 1)) "
     "ELSE ceil(m * pow(10, 1)) END / pow(10, 1))"),
    ("TRUNCATE", "TRUNCATE(n, 1)", "sql",
     "(CASE WHEN n >= 0 THEN floor(n * pow(10, 1)) "
     "ELSE ceil(n * pow(10, 1)) END / pow(10, 1))"),
    ("RAND", "RAND()", "exec", None),
    ("RANDOM", "RANDOM()", "exec", None),
    # ---- datetime functions (DateTimeFunction.java)
    ("CURRENT_DATE", "CURRENT_DATE", "exec", None),
    ("CURRENT_TIMESTAMP", "CURRENT_TIMESTAMP", "exec", None),
    ("CURRENT_TIME", "CURRENT_TIME", "exec", None),
    ("NOW", "NOW()", "exec", None),
    ("CURDATE", "CURDATE()", "exec", None),
    ("CURTIME", "CURTIME()", "exec", None),
    ("LOCALTIME", "LOCALTIME()", "exec", None),
    ("LOCALTIMESTAMP", "LOCALTIMESTAMP()", "exec", None),
    ("DATEADD", "DATEADD(ts, 3)", "sql", "ts + INTERVAL 3 DAY"),
    ("TIMESTAMPADD", "TIMESTAMPADD(ts, 2, 'HOUR')", "sql", "ts + INTERVAL 2 HOUR"),
    ("DATEDIFF", "DATEDIFF(ts, ts2, 'HOUR')", "sql",
     "(epoch(ts2) - epoch(ts))::BIGINT // 3600"),
    ("DATE_TRUNC", "DATE_TRUNC(ts, 'MONTH')", "sql", "date_trunc('month', ts)"),
    ("DAYNAME", "DAYNAME(d)", "sql", "dayname(d)"),
    ("DAY_OF_WEEK", "DAY_OF_WEEK(d)", "sql", "dayofweek(d) + 1"),
    ("DAY_OF_MONTH", "DAY_OF_MONTH(d)", "sql", "day(d)"),
    ("DAY_OF_YEAR", "DAY_OF_YEAR(d)", "sql", "dayofyear(d)"),
    ("EXTRACT", "EXTRACT(YEAR FROM ts)", "sql", "extract(year FROM ts)"),
    ("FORMATDATETIME", "FORMATDATETIME(ts, 'yyyy/MM/dd HH:mm')", "sql",
     "strftime(ts, '%Y/%m/%d %H:%M')"),
    ("HOUR", "HOUR(ts)", "sql", "hour(ts)"),
    ("MINUTE", "MINUTE(ts)", "sql", "minute(ts)"),
    ("MONTH", "MONTH(ts)", "sql", "month(ts)"),
    ("MONTHNAME", "MONTHNAME(d)", "sql", "monthname(d)"),
    ("PARSEDATETIME", "PARSEDATETIME('2024-03-15 10:30:45', 'yyyy-MM-dd HH:mm:ss')",
     "sql", "strptime('2024-03-15 10:30:45', '%Y-%m-%d %H:%M:%S')"),
    ("TO_DATE", "TO_DATE('2024-03-15', 'yyyy-MM-dd')", "sql",
     "strptime('2024-03-15', '%Y-%m-%d')::DATE::VARCHAR"),  # .df() would widen DATE to ts
    ("QUARTER", "QUARTER(ts)", "sql", "quarter(ts)"),
    ("SECOND", "SECOND(ts)", "sql", "second(ts)"),
    ("WEEK", "WEEK(d)", "sql", "weekofyear(d)"),
    ("WEEKOFYEAR", "WEEKOFYEAR(d)", "sql", "weekofyear(d)"),
    ("YEAR", "YEAR(ts)", "sql", "year(ts)"),
    ("DAYOFWEEK", "DAYOFWEEK(d)", "sql", "dayofweek(d) + 1"),
    ("DAYOFMONTH", "DAYOFMONTH(d)", "sql", "day(d)"),
    ("DAYOFYEAR", "DAYOFYEAR(d)", "sql", "dayofyear(d)"),
    # ---- system functions (SystemFunction.java)
    ("COALESCE", "COALESCE(nul, 'x')", "sql", "coalesce(nul, 'x')"),
    ("IFNULL", "IFNULL(nul, 'y')", "sql", "ifnull(nul, 'y')"),
    ("NVL", "NVL(nul, 'z')", "sql", "coalesce(nul, 'z')"),
    ("NULLIF", "NULLIF(s2, 'lo')", "lit", None),
    ("CAST", "CAST(i AS STRING)", "sql", "CAST(i AS VARCHAR)"),
    ("CASE", "CASE WHEN i > 5 THEN 'big' ELSE 'small' END", "sql",
     "CASE WHEN i > 5 THEN 'big' ELSE 'small' END"),
]


def _row() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "s": ["Hello World"],
            "s2": ["lo"],
            "pad": ["  pad  "],
            "hexs": ["00610062"],
            "nul": pd.Series([None], dtype="object"),
            "n": [3.7],
            "m": [-3.7],
            "i": pd.Series([7], dtype="int64"),
            "j": pd.Series([3], dtype="int64"),
            "d": [datetime.date(2024, 3, 15)],
            "ts": [datetime.datetime(2024, 3, 15, 10, 30, 45)],
            "ts2": [datetime.datetime(2024, 3, 18, 13, 32, 50)],
        }
    )


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, (bool,)):
        return bool(v)
    return v


def test_every_zeta_function_has_executable_parity(spark):
    pdf = _row()
    df = spark.createDataFrame(pdf)

    aliased = [f"{expr} AS c{k}" for k, (_, expr, _, _) in enumerate(CASES)]
    sql = "SELECT " + ", ".join(aliased) + " FROM fake"
    out = zeta_sql_transform(df, sql, table_name="fake").toPandas().iloc[0]

    con = duckdb.connect()
    con.register("t", pdf)
    duck_items = [
        (k, oracle)
        for k, (_, _, kind, oracle) in enumerate(CASES)
        if kind == "sql"
    ]
    duck_sql = "SELECT " + ", ".join(f"{o} AS c{k}" for k, o in duck_items) + " FROM t"
    duck = con.execute(duck_sql).df().iloc[0]

    failures = []
    for k, (name, expr, kind, oracle) in enumerate(CASES):
        got = _norm(out[f"c{k}"])
        if kind == "exec":
            if got is None:
                failures.append((name, expr, "NULL from exec-only case"))
        elif kind == "lit":
            if got != _norm(oracle):
                failures.append((name, expr, f"got {got!r} want {oracle!r}"))
        else:
            want = _norm(duck[f"c{k}"])
            if isinstance(got, float) or isinstance(want, float):
                ok = got is not None and want is not None and abs(got - want) < 1e-9
            else:
                ok = got == want
            if not ok:
                failures.append((name, expr, f"got {got!r} want {want!r}"))
    assert not failures, "\n".join(map(str, failures))


def test_parity_suite_covers_every_mapped_function():
    covered = {name for name, _, _, _ in CASES}
    missing = set(ALL_ZETA_FUNCTIONS) - covered
    assert not missing, f"zeta functions mapped but not parity-tested: {sorted(missing)}"


def test_engine_rejects_like_reference(spark):
    """Validation message parity with ZetaSQLEngine.validateSQL:99-157."""
    from seatunnel_spark.functions.sql_engine import ZetaSqlError

    df = spark.createDataFrame(_row())
    rejects = {
        "UPDATE t SET a = 1": "Only supported DQL(select) SQL",
        "SELECT a FROM other": "Table name: other not found",
        "SELECT a FROM db.t": "Unsupported schema syntax",
        "SELECT a FROM t AS x": "Unsupported table alias name syntax",
        "SELECT a FROM t JOIN u ON a = b": "Unsupported table join syntax",
        "SELECT a FROM t GROUP BY a": "Unsupported GROUP BY syntax",
        "SELECT a FROM t ORDER BY a": "Unsupported ORDER BY syntax",
        "SELECT a FROM t LIMIT 1": "Unsupported LIMIT,OFFSET syntax",
        "SELECT a FROM (SELECT 1)": "Unsupported sub table syntax",
    }
    for sql, msg in rejects.items():
        with pytest.raises(ZetaSqlError, match=msg.replace("(", r"\(").replace(")", r"\)")):
            zeta_sql_transform(df, sql, table_name="t")


def test_engine_executes_select_star_and_where(spark):
    df = spark.createDataFrame(_row())
    assert zeta_sql_transform(df, "SELECT * FROM t", "t").columns == df.columns
    out = zeta_sql_transform(
        df, "SELECT UCASE(s) AS u, i FROM t WHERE LENGTH(s) > 5 AND i = 7", "t"
    )
    assert out.collect()[0]["u"] == "HELLO WORLD"
    empty = zeta_sql_transform(df, "SELECT s FROM t WHERE i > 100", "t")
    assert empty.count() == 0
