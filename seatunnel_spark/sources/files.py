"""File connector family: text/json/csv/parquet/orc read + write.

Reference: connector-file-base sink/writer/{Text,Json,Orc,Parquet,Excel}
WriteStrategy.java and the file source formats. Spark's DataSource framework
subsumes text/json/csv/parquet/orc; excel is a pure-stdlib SpreadsheetML
subset in sources/excel.py (no POI needed — xlsx is a zip of public-spec
XML).

All writers support the reference's save modes (DataSaveMode.java):
error_if_exists / append / overwrite / ignore → Spark write modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

READ_FORMATS = {"text", "json", "csv", "parquet", "orc", "excel"}
WRITE_FORMATS = {"text", "json", "csv", "parquet", "orc", "excel"}
SAVE_MODES = {"error_if_exists": "errorifexists", "append": "append",
              "overwrite": "overwrite", "ignore": "ignore"}


def read_file_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: T.StructType | None = None,
    options: dict | None = None,
) -> DataFrame:
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported source format {fmt!r} (have {sorted(READ_FORMATS)})")
    if fmt == "excel":
        from seatunnel_spark.sources.excel import read_excel_source

        return read_excel_source(spark, path, schema=schema)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(path)


def write_file_sink(
    df: DataFrame,
    fmt: str,
    path: str,
    save_mode: str = "error_if_exists",
    partition_by: list[str] | None = None,
    options: dict | None = None,
) -> None:
    if fmt == "excel":
        from seatunnel_spark.sources.excel import write_excel_sink

        if partition_by:
            raise ValueError("excel sink does not support partition_by")
        if save_mode not in SAVE_MODES:
            raise ValueError(f"unknown save_mode {save_mode!r}")
        write_excel_sink(df, path, save_mode=save_mode)
        return
    if fmt not in WRITE_FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r} (have {sorted(WRITE_FORMATS)})")
    writer = df.write.mode(SAVE_MODES[save_mode])
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    getattr(writer, fmt)(path)


# ---------------------------------------------------------------- text format
# Reference: seatunnel-format-text (TextDeserializationSchema /
# TextSerializationSchema + TextFormatConstant.SEPARATOR): typed rows as
# delimiter-separated text — field delimiter \x01 (configurable,
# BaseSinkConfig.FIELD_DELIMITER), nested levels \x02/\x03 for array
# elements and map entries/pairs. Pure split/concat_ws/cast expressions —
# codegen'd, no Python.
TEXT_SEPARATORS = ["\u0001", "\u0002", "\u0003", "\u0004"]


def _rx(delim: str) -> str:
    """Delimiters are literals, but Spark's split takes a Java regex —
    \\Q...\\E quoting makes any delimiter (incl. '|', '.') safe."""
    return "\\Q" + delim + "\\E"


def _cast_scalar(col, dt: T.DataType):
    from pyspark.sql import functions as F

    if isinstance(dt, T.BooleanType):
        # reference TextDeserializationSchema parses Java Boolean spelling
        return F.lower(col).cast("boolean")
    return col.cast(dt)


def _scalar_caster(dt: T.DataType):
    return lambda e: _cast_scalar(e, dt)


def _entry_caster(dt: T.DataType, part: int):
    from pyspark.sql import functions as F

    return lambda e: _cast_scalar(F.split(e, _rx(TEXT_SEPARATORS[2]), -1)[part], dt)


def read_delimited_text(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    field_delimiter: str = TEXT_SEPARATORS[0],
) -> DataFrame:
    """Typed delimiter-text read: one line per row, fields split by
    ``field_delimiter``, arrays by the level-2 separator, map entries by
    level-2 with key/value at level-3 — the reference's separator
    hierarchy. Empty strings parse as NULL for non-string scalars (the
    reference's lenient primitive parse).

    Known conflation, shared with the reference wire format: text has no
    null marker, so a NULL collection and an EMPTY collection both
    serialize as '' and both read back as NULL (likewise '' vs NULL
    string: both read as ''). A round-trip therefore maps empty
    array/map → NULL. This matches TextSerializationSchema (nulls and
    empties are indistinguishable on the wire); callers needing the
    distinction should use a self-describing format (json/parquet/orc)."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    parts = F.split(F.col("value"), _rx(field_delimiter), -1)
    cols = []
    for i, f in enumerate(schema.fields):
        c = parts[i]
        if isinstance(f.dataType, T.ArrayType):
            elems = F.split(c, _rx(TEXT_SEPARATORS[1]), -1)
            # closure factory, NOT a default-arg lambda: a two-arg lambda
            # makes Spark pass the element INDEX as the second argument
            c = F.when(
                F.length(c) > 0,
                F.transform(elems, _scalar_caster(f.dataType.elementType)),
            )
        elif isinstance(f.dataType, T.MapType):
            entries = F.filter(
                F.split(c, _rx(TEXT_SEPARATORS[1]), -1), lambda e: F.length(e) > 0
            )
            c = F.when(
                F.length(c) > 0,
                F.map_from_arrays(
                    F.transform(entries, _entry_caster(f.dataType.keyType, 0)),
                    F.transform(entries, _entry_caster(f.dataType.valueType, 1)),
                ),
            )
        elif isinstance(f.dataType, T.StringType):
            pass
        else:
            c = _cast_scalar(F.when(F.length(c) > 0, c), f.dataType)
        cols.append(c.alias(f.name))
    return raw.select(*cols)


def write_delimited_text(
    df: DataFrame,
    path: str,
    field_delimiter: str = TEXT_SEPARATORS[0],
    save_mode: str = "error_if_exists",
) -> None:
    """Typed delimiter-text write (TextSerializationSchema parity): nulls
    serialize as empty, arrays join on the level-2 separator, maps as
    k<sep3>v entries on level-2. NULL and empty collections/strings are
    indistinguishable on this wire (see read_delimited_text docstring)."""
    from pyspark.sql import functions as F

    if save_mode not in SAVE_MODES:
        raise ValueError(f"unknown save_mode {save_mode!r}")
    parts = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.ArrayType):
            s = F.concat_ws(
                TEXT_SEPARATORS[1], F.transform(c, lambda e: e.cast("string"))
            )
        elif isinstance(f.dataType, T.MapType):
            s = F.concat_ws(
                TEXT_SEPARATORS[1],
                F.transform(
                    F.map_entries(c),
                    lambda e: F.concat_ws(
                        TEXT_SEPARATORS[2],
                        e["key"].cast("string"),
                        e["value"].cast("string"),
                    ),
                ),
            )
        else:
            s = c.cast("string")
        parts.append(F.coalesce(s, F.lit("")))
    out = df.select(F.concat_ws(field_delimiter, *parts).alias("value"))
    out.write.mode(SAVE_MODES[save_mode]).text(path)
