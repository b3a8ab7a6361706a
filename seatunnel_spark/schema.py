"""Schemas and type lattice for the CDC engine.

Reference mapping (SeaTunnel → Spark):
- ``SeaTunnelRow`` (Object[] + tableId + RowKind) → a DataFrame row with
  explicit ``op`` (RowKind) and ``seq`` (log offset) metadata columns.
  Reference: seatunnel-api/.../table/type/SeaTunnelRow.java:27-74.
- ``RowKind`` INSERT/+I, UPDATE_AFTER/+U, DELETE/-D → op ∈ {'I','U','D'}.
  UPDATE_BEFORE is never materialized because our MERGE is keyed
  (reference RowKind.java:26-47; the reference's own sink dedup also drops
  UPDATE_BEFORE — BufferReducedBatchStatementExecutor.java:56-58).
- ``SqlType`` lattice → Spark types, the same mapping the reference ships in
  seatunnel-translation-spark-common TypeConverterUtils.java:55-123.
- ``SchemaChangeEvent`` (AlterTableAdd/Change/ModifyColumnEvent) → a DDL
  event row whose ``ddl`` column is a JSON document.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import types as T

# ---------------------------------------------------------------- RowKind
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
OP_DDL = "DDL"

# -------------------------------------------------- SqlType → Spark types
# Reference: seatunnel-api SqlType.java:21-38 and
# seatunnel-translation-spark-common TypeConverterUtils.java:55-123
# (TIME is unsupported on Spark there too — maps to string here).
SQLTYPE_TO_SPARK: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "NULL": T.NullType(),
    "BYTES": T.BinaryType(),
    "DATE": T.DateType(),
    "TIME": T.StringType(),
    "TIMESTAMP": T.TimestampType(),
}


def sqltype_to_spark(name: str) -> T.DataType:
    """Full SqlType lattice → Spark, including the parameterized kinds the
    reference's Spark translation handles (TypeConverterUtils.java:55-123):

    - ``DECIMAL(p,s)`` → DecimalType(p,s)
    - ``ARRAY<T>`` → ArrayType(T)
    - ``MAP<K,V>`` → MapType(K,V)
    - ``ROW<name type, ...>`` → StructType (reference SeaTunnelRowType)

    Nested forms compose (``ARRAY<DECIMAL(10,2)>``); plain names fall back to
    the scalar map above. Spark's own DDL parser already implements exactly
    this grammar (`decimal(p,s)`, `array<t>`, `map<k,v>`, `struct<...>`), so
    non-scalar types delegate to it — one grammar, no drift.
    """
    up = name.strip().upper()
    if up in SQLTYPE_TO_SPARK:
        return SQLTYPE_TO_SPARK[up]
    ddl = name.strip().replace("ROW<", "struct<").replace("row<", "struct<")
    return T.StructType.fromDDL(f"x {ddl}")[0].dataType


_DECIMAL_RE_P = r"^decimal\((\d+),\s*(\d+)\)$"

# SQL-dialect spellings → the lattice names above. Lake schemas store lattice
# names ('string', 'int', ...) while raw binlog DDL carries MySQL/ANSI
# spellings ('varchar(255)', 'integer', 'double precision'); comparisons and
# storage must speak one vocabulary or the common MySQL rename idiom
# `CHANGE old new VARCHAR(n)` (which restates the type) kills the stream.
_TYPE_ALIASES = {
    "integer": "int",
    "int4": "int",
    "mediumint": "int",
    "serial": "int",
    "int8": "bigint",
    "long": "bigint",
    "bigserial": "bigint",
    "int2": "smallint",
    "int1": "tinyint",
    "bool": "boolean",
    "real": "float",
    "float4": "float",
    "float8": "double",
    "double precision": "double",
    "datetime": "timestamp",
    "timestamptz": "timestamp",
    "numeric": "decimal",
}
_CHAR_FAMILY = ("varchar", "character varying", "nvarchar", "character", "nchar", "char")
_TEXT_FAMILY = {"text", "tinytext", "mediumtext", "longtext", "clob", "json", "string"}
_BINARY_FAMILY = ("varbinary", "binary", "blob", "tinyblob", "mediumblob", "longblob")


def normalize_sql_type(t: str, keep_length: bool = False) -> str:
    """Normalize a SQL type spelling to the lattice vocabulary.

    ``varchar(255)``/``char(10)``/``text`` → ``string`` (or ``varchar(n)``
    when ``keep_length`` — used only by the widening comparison so length
    growth can be recognized), ``integer`` → ``int``, ``numeric(p,s)`` →
    ``decimal(p,s)``, ``datetime(3)`` → ``timestamp``, blob family →
    ``bytes``. Unknown spellings pass through lowercased (the Spark DDL
    parser in sqltype_to_spark is the final arbiter)."""
    import re

    s = re.sub(r"\s+", " ", t.strip().lower())
    # MySQL display-width / sign attributes carry no type information
    s = re.sub(r"\s+(unsigned|signed|zerofill)\b", "", s)
    s = re.sub(r"^(tinyint|smallint|mediumint|int|integer|bigint)\(\d+\)", r"\1", s)
    for fam in _CHAR_FAMILY:
        m = re.match(rf"^{fam}\s*(\((\d+)\))?$", s)
        if m:
            return f"varchar({m.group(2)})" if (keep_length and m.group(2)) else "string"
    if s in _TEXT_FAMILY or s.startswith("enum(") or s.startswith("set("):
        return "string"
    for fam in _BINARY_FAMILY:
        if re.match(rf"^{fam}(\(\d+\))?$", s):
            return "bytes"
    m = re.match(r"^(timestamp|datetime|time)(\(\d+\))?( with(out)? time zone)?$", s)
    if m:
        return "string" if m.group(1) == "time" else "timestamp"
    m = re.match(r"^(numeric|decimal|dec)\s*\((\d+)\s*,\s*(\d+)\)$", s)
    if m:
        return f"decimal({m.group(2)},{m.group(3)})"
    m = re.match(r"^(numeric|decimal|dec)\s*\((\d+)\)$", s)
    if m:
        return f"decimal({m.group(2)},0)"
    return _TYPE_ALIASES.get(s, s)

# Type-widening lattice used by widen_type DDL (only widenings that parquet
# readers can satisfy with a cast are legal — same rule Iceberg enforces).
LEGAL_WIDENINGS: set[tuple[str, str]] = {
    ("int", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("float", "double"),
}


def is_legal_widening(old: str, new: str) -> bool:
    """The enumerable widenings plus the DECIMAL rule Iceberg enforces:
    precision may grow, scale must stay fixed — decimal(P,S) → decimal(P',S)
    with P' >= P (values re-read exactly; a scale change would re-quantize).
    The identity change is always legal: MySQL CHANGE/MODIFY restate the
    column type even when only renaming or touching nullability/comments,
    and rejecting `int -> int` would kill the stream on the most common
    rename pattern.

    Both sides are normalized first (varchar/text → string, integer → int,
    numeric → decimal, ...) so a lake schema storing lattice names compares
    correctly against raw-DDL MySQL spellings. String-family rules: varchar
    length growth is a legal widening; varchar ↔ string in either direction
    is the identity change (the lake never tracks lengths, so a restated
    ``VARCHAR(n)`` over a stored ``string`` is the rename idiom, not a
    narrowing)."""
    import re

    o = normalize_sql_type(old, keep_length=True)
    n = normalize_sql_type(new, keep_length=True)
    if o == n:
        return True
    vo = re.match(r"^varchar\((\d+)\)$", o)
    vn = re.match(r"^varchar\((\d+)\)$", n)
    if vo and vn:
        return int(vn.group(1)) >= int(vo.group(1))
    if (vo or o == "string") and (vn or n == "string"):
        return True  # varchar(n) ↔ string: identity under the length-free lake
    if (o, n) in LEGAL_WIDENINGS:
        return True
    mo, mn = re.match(_DECIMAL_RE_P, o), re.match(_DECIMAL_RE_P, n)
    if mo and mn:
        return int(mn.group(2)) == int(mo.group(2)) and int(mn.group(1)) >= int(mo.group(1))
    return False

# ------------------------------------------------------- table schemas
# The BASELINE input shape: an Iceberg table of source-code repositories.
REPO_KEY = ["repo", "path"]

REPO_FIELDS: list[tuple[str, str]] = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]


def repo_schema() -> T.StructType:
    return T.StructType(
        [T.StructField(n, T.StringType(), n not in ("repo", "path")) for n, _ in REPO_FIELDS]
    )


def event_schema() -> T.StructType:
    """Change-event stream schema (binlog/WAL shape, FIXTURES.md §2).

    ``extra`` carries post-DDL column values as a JSON map so the wire schema
    of the stream never changes even as the target table evolves — the
    superset-struct strategy from SURVEY §1.2.
    """
    return T.StructType(
        [
            T.StructField("seq", T.LongType(), False),
            T.StructField("txn_id", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("repo", T.StringType(), True),
            T.StructField("path", T.StringType(), True),
            T.StructField("commit", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
            T.StructField("ddl", T.StringType(), True),
            T.StructField("extra", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )


# --------------------------------------------------- schema-change events
@dataclass(frozen=True)
class SchemaChange:
    """Parsed DDL event.

    kind ∈ {add_column, rename_column, widen_type, drop_column,
    rename_table, batch}.
    Reference: seatunnel-api table/event/AlterTable{Add,Change,Modify,Drop}
    ColumnEvent.java, applied by AlterTableEventHandler.java:53-163;
    rename_table = AlterTableNameEvent.java; batch = AlterTableColumnsEvent
    .java (a list of column events applied atomically at one log offset).
    ``changes`` is the batch payload — a tuple of sub-SchemaChanges, none of
    which may itself be a batch or rename_table (same constraint as the
    reference, whose AlterTableColumnsEvent holds only column events).
    """

    kind: str
    name: str | None = None
    type: str | None = None
    old_name: str | None = None
    changes: tuple["SchemaChange", ...] | None = None

    @staticmethod
    def from_json(payload: str) -> "SchemaChange":
        return SchemaChange._from_dict(json.loads(payload))

    @staticmethod
    def _from_dict(d: dict) -> "SchemaChange":
        return SchemaChange(
            kind=d["kind"],
            name=d.get("name"),
            type=d.get("type"),
            old_name=d.get("old_name"),
            changes=tuple(SchemaChange._from_dict(c) for c in d["changes"])
            if d.get("changes") is not None
            else None,
        )

    def _to_dict(self) -> dict:
        d = {"kind": self.kind}
        for k in ("name", "type", "old_name"):
            v = getattr(self, k)
            if v is not None:
                d[k] = v
        if self.changes is not None:
            d["changes"] = [c._to_dict() for c in self.changes]
        return d

    def to_json(self) -> str:
        return json.dumps(self._to_dict(), sort_keys=True)


def parse_change(payload: str) -> SchemaChange:
    """DDL event payload → SchemaChange: the engine's JSON form, or a raw
    ``ALTER TABLE`` statement (what canal/binlog streams carry)."""
    p = payload.strip()
    if p.startswith("{"):
        return SchemaChange.from_json(p)
    return parse_alter_sql(p)


def parse_alter_sql(sql: str) -> SchemaChange:
    """Raw ``ALTER TABLE`` DDL → SchemaChange — what a real binlog carries.

    Reference: the CDC sources resolve captured DDL statements into typed
    AlterTable*ColumnEvents (SchemaChangeResolver + the MySQL source's DDL
    parsing). Supported statements (MySQL + ANSI spellings):

        ALTER TABLE t ADD [COLUMN] name TYPE
        ALTER TABLE t DROP [COLUMN] name
        ALTER TABLE t RENAME COLUMN a TO b
        ALTER TABLE t RENAME [TO|AS] new_name
        ALTER TABLE t CHANGE [COLUMN] old new TYPE     (MySQL rename+type)
        ALTER TABLE t MODIFY [COLUMN] name TYPE        (MySQL type change)

    Multiple comma-separated clauses become one ``batch`` change (the
    reference's AlterTableColumnsEvent). Types pass through lowercased for
    the SqlType lattice (DECIMAL(p,s) etc. preserved)."""
    import re

    s = sql.strip().rstrip(";").strip()
    m = re.match(r"(?is)^ALTER\s+TABLE\s+(`?[\w.]+`?)\s+(.*)$", s)
    if not m:
        raise ValueError(f"not an ALTER TABLE statement: {sql!r}")
    rest = m.group(2).strip()

    def ident(tok: str) -> str:
        return tok.strip().strip('`"')

    def clean_type(t: str) -> str:
        # strip the column attributes MySQL DDL appends after the type —
        # NOT NULL / NULL / DEFAULT v / COMMENT '...' / AUTO_INCREMENT /
        # FIRST / AFTER col — the lattice cares about the type alone
        t = t.strip()
        attr = re.compile(
            r"(?is)\s+(NOT\s+NULL|NULL|DEFAULT\s+('[^']*'|\S+)|COMMENT\s+('[^']*'|\S+)"
            r"|AUTO_INCREMENT|FIRST|AFTER\s+\S+)\s*$"
        )
        while True:
            t2 = attr.sub("", t)
            if t2 == t:
                return t.lower()
            t = t2

    # clauses that change no column: indexes/keys/constraints/table options.
    # The reference resolves DDL into column events only (AlterTable*Column
    # Event) and ignores the rest — an ADD INDEX in the binlog must NOT kill
    # the stream. Matched clauses are dropped; if nothing remains the whole
    # statement is a no-op batch (update_schema commits nothing).
    _IGNORABLE = re.compile(
        r"(?is)^("
        r"ADD\s+(UNIQUE\s+|FULLTEXT\s+|SPATIAL\s+)?(INDEX|KEY)\b"
        r"|ADD\s+(CONSTRAINT\b.*|PRIMARY\s+KEY\b.*|FOREIGN\s+KEY\b.*)"
        r"|DROP\s+(INDEX|KEY|PRIMARY\s+KEY|FOREIGN\s+KEY|CONSTRAINT)\b"
        r"|RENAME\s+(INDEX|KEY)\b"
        r"|ALTER\s+(INDEX|COLUMN\s+\S+\s+SET\s+DEFAULT|COLUMN\s+\S+\s+DROP\s+DEFAULT)\b"
        r"|(DEFAULT\s+)?(CHARACTER\s+SET|CHARSET|COLLATE)\b"
        r"|ENGINE\s*=|AUTO_INCREMENT\s*=|COMMENT\s*=|ROW_FORMAT\s*=|ORDER\s+BY\b"
        r"|ENABLE\s+KEYS|DISABLE\s+KEYS|FORCE$|LOCK\s*=|ALGORITHM\s*="
        r")"
    )

    def one(clause: str) -> SchemaChange | None:
        c = clause.strip()
        if _IGNORABLE.match(c):
            return None
        cm = re.match(r"(?is)^ADD\s+(?:COLUMN\s+)?(\S+)\s+(.+)$", c)
        if cm:
            return SchemaChange(kind="add_column", name=ident(cm.group(1)),
                                type=clean_type(cm.group(2)))
        cm = re.match(r"(?is)^DROP\s+(?:COLUMN\s+)?(\S+)$", c)
        if cm:
            return SchemaChange(kind="drop_column", name=ident(cm.group(1)))
        cm = re.match(r"(?is)^RENAME\s+COLUMN\s+(\S+)\s+TO\s+(\S+)$", c)
        if cm:
            return SchemaChange(kind="rename_column", old_name=ident(cm.group(1)),
                                name=ident(cm.group(2)))
        cm = re.match(r"(?is)^RENAME\s+(?:TO\s+|AS\s+)?(\S+)$", c)
        if cm:
            return SchemaChange(kind="rename_table", name=ident(cm.group(1)))
        cm = re.match(r"(?is)^CHANGE\s+(?:COLUMN\s+)?(\S+)\s+(\S+)\s+(.+)$", c)
        if cm:
            old, new, typ = ident(cm.group(1)), ident(cm.group(2)), clean_type(cm.group(3))
            if old == new:
                return SchemaChange(kind="widen_type", name=new, type=typ)
            # rename + type change: the reference emits both column events
            return SchemaChange(kind="batch", changes=(
                SchemaChange(kind="rename_column", old_name=old, name=new),
                SchemaChange(kind="widen_type", name=new, type=typ),
            ))
        cm = re.match(r"(?is)^MODIFY\s+(?:COLUMN\s+)?(\S+)\s+(.+)$", c)
        if cm:
            return SchemaChange(kind="widen_type", name=ident(cm.group(1)),
                                type=clean_type(cm.group(2)))
        raise ValueError(f"unsupported ALTER clause: {clause!r}")

    # split top-level commas (types like DECIMAL(10,2) contain commas inside parens)
    clauses, depth, start = [], 0, 0
    for i, ch in enumerate(rest):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            clauses.append(rest[start:i])
            start = i + 1
    clauses.append(rest[start:])
    parsed = [one(c) for c in clauses if c.strip()]
    n_ignored = sum(1 for p in parsed if p is None)
    parsed = [p for p in parsed if p is not None]
    if not parsed:
        # all clauses were index/option noise → explicit no-op
        return SchemaChange(kind="batch", changes=())
    if len(parsed) == 1 and n_ignored == 0:
        return parsed[0]
    flat: list[SchemaChange] = []
    for p in parsed:
        if p.kind == "rename_table":
            if len(parsed) > 1:
                raise ValueError("RENAME table cannot be batched with column clauses")
            return p
        flat.extend(p.changes if p.kind == "batch" else (p,))
    return flat[0] if len(flat) == 1 else SchemaChange(kind="batch", changes=tuple(flat))
