"""Zeta SQL scalar function library → Spark built-ins.

The reference ships ~90 row-at-a-time Java scalar functions
(seatunnel-transforms-v2 sql/zeta/ZetaSQLFunction.java constants; impls in
sql/zeta/functions/{String,Numeric,DateTime,System}Function.java). Every one
maps to a JVM-side, codegen'd Spark expression — no Python in the hot path.
This module provides the name-level mapping so a Zeta SQL expression string
can be rewritten to Spark SQL, plus the handful that need renaming.

Functions whose Spark name is identical (pass-through, validated in tests):
  ASCII CHAR CONCAT CONCAT_WS LOWER UPPER LPAD RPAD TRIM LTRIM RTRIM
  REGEXP_REPLACE REPEAT REPLACE SOUNDEX SUBSTRING TRANSLATE LENGTH
  ABS ACOS ASIN ATAN ATAN2 CEIL COS COSH EXP FLOOR LN LOG LOG10 MOD
  PI POWER RAND ROUND SIGN SIN SINH SQRT TAN TRUNC
  COALESCE NULLIF CASE CAST
  YEAR MONTH DAY HOUR MINUTE SECOND WEEKOFYEAR DAYOFWEEK
"""

from __future__ import annotations

import re

# Zeta name → Spark SQL name/template for the ones that differ.
# (reference name from ZetaSQLFunction.java → pyspark.sql.functions)
RENAMES: dict[str, str] = {
    "FORMATDATETIME": "DATE_FORMAT",
    "PARSEDATETIME": "TO_TIMESTAMP",
    "IFNULL": "COALESCE",
    "NVL": "COALESCE",
    "CHARACTER_LENGTH": "CHAR_LENGTH",
    "LOCALTIME": "CURRENT_TIMESTAMP",
    "LOCALTIMESTAMP": "CURRENT_TIMESTAMP",
    "NOW": "CURRENT_TIMESTAMP",
    "CURDATE": "CURRENT_DATE",
    "CURTIME": "CURRENT_TIMESTAMP",
    "DAY_OF_WEEK": "DAYOFWEEK",
    "DAY_OF_MONTH": "DAYOFMONTH",
    "DAY_OF_YEAR": "DAYOFYEAR",
    "DATEADD": "DATE_ADD",      # Zeta DATEADD(date, n) adds days
    "TIMESTAMPADD": "TIMESTAMPADD",
    "DATEDIFF": "DATEDIFF",
    "DATE_TRUNC": "DATE_TRUNC",
    "REGEXP_LIKE": "REGEXP_LIKE",
    "REGEXP_SUBSTR": "REGEXP_EXTRACT",
    "STRINGDECODE": "DECODE",
    "STRINGENCODE": "ENCODE",
    "HEXTORAW": "UNHEX",
    "RAWTOHEX": "HEX",
}

_IDENT = re.compile(r"\b([A-Z][A-Z0-9_]*)\s*\(", re.IGNORECASE)


def rewrite_zeta_sql(expr: str) -> str:
    """Rewrite a Zeta SQL scalar expression into Spark SQL by renaming the
    functions that differ; identical names pass through untouched."""

    def sub(m: re.Match) -> str:
        name = m.group(1).upper()
        return f"{RENAMES.get(name, name)}("

    return _IDENT.sub(sub, expr)
