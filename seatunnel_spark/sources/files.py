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
