"""Hive-layout warehouse connector — metastore-less.

Reference: connector-hive (HiveSource.java:63-120 requires metastore_uri +
table_name, then delegates the actual reads to BaseHdfsFileSource over the
table's storage location; HiveSink mirrors it with hive_table_name /
hive_metastore_uris / partition_by / sink_columns —
fakesource_to_hive.conf). The metastore's only job in that flow is
name→location+schema resolution; the data path is plain files in the Hive
warehouse layout::

    <warehouse>/<db>.db/<table>/<part_col>=<val>/.../part-*.parquet

This module implements exactly that layout on any filesystem Spark can
read, resolving ``db.table`` names itself (the ``file://`` analog of the
metastore): Spark's partitioned-directory discovery supplies partition
columns and partition pruning natively, so a filter on a partition column
never touches pruned directories — the same pruning the metastore-backed
reader gets from partition metadata. A deployment with a real metastore
just swaps this reader for ``spark.table`` — the engine-facing DataFrame is
identical.

``read_partitions`` follows the reference's spelling
(``["par1=xxx", "par1=yyy/par2=zzz"]``) including its equal-depth rule
(Hive.md: every entry must have the same directory depth).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def hive_table_path(warehouse: str, table_name: str) -> str:
    """``db.table`` → ``<warehouse>/db.db/table`` (default-db tables may be
    spelled bare or as ``default.table`` — both land in the warehouse root,
    Hive's default-database convention)."""
    if "." in table_name:
        db, tbl = table_name.split(".", 1)
        if db == "default":
            return os.path.join(warehouse, tbl)
        return os.path.join(warehouse, f"{db}.db", tbl)
    return os.path.join(warehouse, table_name)


def _check_partition_spec(read_partitions: list[str]) -> None:
    depths = {p.strip("/").count("/") for p in read_partitions}
    if len(depths) > 1:
        # the reference rejects mixed-depth partition lists (Hive.md tips)
        raise ValueError(
            f"read_partitions entries must share one directory depth, got {read_partitions}"
        )
    for p in read_partitions:
        for seg in p.strip("/").split("/"):
            if "=" not in seg:
                raise ValueError(f"partition segment {seg!r} is not col=value")


def read_hive_table(
    spark: SparkSession,
    warehouse: str,
    table_name: str,
    file_format: str = "parquet",
    schema=None,
    read_partitions: list[str] | None = None,
    read_columns: list[str] | None = None,
) -> DataFrame:
    """Read a Hive-layout table. ``read_partitions`` loads ONLY those
    partition directories (directory pruning before the scan even plans —
    the strongest form of partition pruning) while ``basePath`` keeps the
    partition columns in the schema; ``read_columns`` projects (column
    pruning reaches the reader via the narrowed ReadSchema)."""
    base = hive_table_path(warehouse, table_name)
    reader = spark.read.format(file_format).option("basePath", base)
    if schema is not None:
        reader = reader.schema(schema)
    if read_partitions:
        _check_partition_spec(read_partitions)
        paths = [os.path.join(base, p.strip("/")) for p in read_partitions]
        df = reader.load(paths)
    else:
        df = reader.load(base)
    if read_columns:
        df = df.select(*read_columns)
    return df


def write_hive_table(
    df: DataFrame,
    warehouse: str,
    table_name: str,
    partition_by: list[str] | None = None,
    sink_columns: list[str] | None = None,
    file_format: str = "parquet",
    mode: str = "append",
) -> str:
    """HiveSink analog: land ``sink_columns`` of ``df`` into the warehouse
    layout, partitioned by ``partition_by`` (dynamic partitions — each task
    writes straight into its partition directories, no driver funnel).
    Returns the table path."""
    path = hive_table_path(warehouse, table_name)
    out = df.select(*sink_columns) if sink_columns else df
    writer = out.write.format(file_format).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return path
