"""JDBC source: partitioned (chunk-split) reads.

Reference: connector-jdbc source — JdbcSourceSplitEnumerator discovers the
split column's bounds with one MIN/MAX query and cuts the table into chunks
(AbstractJdbcSourceChunkSplitter: splitEvenlySizedChunks for numeric/date
columns, efficientShardingThroughSampling for everything else), each chunk
becoming one reader's WHERE-bounded query.

Spark-first mapping: the chunk list IS Spark's JDBC partitioning —
``spark.read.jdbc(partitionColumn/lowerBound/upperBound/numPartitions)`` for
the numeric path (Spark generates exactly the evenly-sized WHERE ranges,
executor-side, in parallel), and ``spark.read.jdbc(predicates=[...])`` for
the sampling path (one predicate per chunk). The only driver-side SQL is the
bounds/sample discovery, same as the reference's enumerator. At 100 TB the
bottleneck is the database, not Spark: chunk count scales reader parallelism
and keeps every per-chunk query index-ranged on the split column.

The bounds query runs over the SAME JVM JDBC driver Spark's executors use
(via the py4j gateway) — no Python database driver needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def driver_connection(spark: SparkSession, url: str):
    """Open a driver-side JDBC connection through the JVM gateway (the same
    DriverManager the executors use). Caller closes it."""
    return spark._jvm.java.sql.DriverManager.getConnection(url)


def _query_one_row(spark: SparkSession, url: str, sql: str) -> list:
    conn = driver_connection(spark, url)
    try:
        st = conn.createStatement()
        rs = st.executeQuery(sql)
        n = rs.getMetaData().getColumnCount()
        rs.next()
        row = [rs.getObject(i + 1) for i in range(n)]
        rs.close()
        st.close()
        return row
    finally:
        conn.close()


def _query_column(spark: SparkSession, url: str, sql: str) -> list:
    conn = driver_connection(spark, url)
    try:
        st = conn.createStatement()
        rs = st.executeQuery(sql)
        out = []
        while rs.next():
            out.append(rs.getObject(1))
        rs.close()
        st.close()
        return out
    finally:
        conn.close()


def q(ident: str) -> str:
    """Quote an identifier (ANSI double quotes — Derby/PG/Oracle; MySQL's
    backtick variant lives in the sink dialects)."""
    return '"' + ident.replace('"', '""') + '"'


def compute_numeric_splits(lo: int, hi: int, num_splits: int) -> list[tuple[int, int]]:
    """Evenly-sized inclusive [start, end] ranges covering [lo, hi] —
    the reference's splitEvenlySizedChunks, as a pure function. The last
    chunk absorbs the remainder, matching the reference's open-ended tail."""
    if num_splits <= 1 or hi <= lo:
        return [(lo, hi)]
    step = max(1, (hi - lo + 1 + num_splits - 1) // num_splits)
    out = []
    start = lo
    while start <= hi:
        end = min(start + step - 1, hi)
        out.append((start, end))
        start = end + 1
    return out


def sample_shard_predicates(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    num_partitions: int,
    sample_rows: int = 1000,
) -> list[str]:
    """Equi-depth sharding for non-numeric split columns — the intent of the
    reference's efficientShardingThroughSampling
    (AbstractJdbcSourceChunkSplitter.java:233-269): shard boundaries spread
    ACROSS the whole sorted key range so every reader gets ~equal rows.
    Realized as one COUNT(*) plus (num_partitions - 1) exact quantile probes
    ``ORDER BY col OFFSET k FETCH FIRST 1 ROW`` (ANSI, index-ranged on the
    split column) — boundaries at the true 1/N row depths, no skew. Taking
    the N smallest values as the 'sample' would put every boundary in the
    bottom of the key space and hand one reader ~the whole table.
    ``sample_rows`` is kept for API parity; exact probes subsume it."""
    n_rows = int(
        _query_one_row(
            spark, url,
            f"SELECT COUNT(*) FROM {table} WHERE {q(column)} IS NOT NULL",
        )[0] or 0
    )
    if n_rows < 2 or num_partitions <= 1:
        return ["1=1"]
    bounds_set = set()
    for i in range(1, num_partitions):
        offset = (i * n_rows) // num_partitions
        row = _query_one_row(
            spark, url,
            f"SELECT {q(column)} FROM {table} WHERE {q(column)} IS NOT NULL "
            f"ORDER BY {q(column)} OFFSET {offset} ROWS FETCH FIRST 1 ROWS ONLY",
        )
        if row and row[0] is not None:
            bounds_set.add(str(row[0]))
    bounds = sorted(bounds_set)
    if not bounds:
        return ["1=1"]

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    preds = [f"{q(column)} < {lit(bounds[0])} OR {q(column)} IS NULL"]
    for a, b in zip(bounds, bounds[1:]):
        preds.append(f"{q(column)} >= {lit(a)} AND {q(column)} < {lit(b)}")
    preds.append(f"{q(column)} >= {lit(bounds[-1])}")
    return preds


def jdbc_partitioned_read(
    spark: SparkSession,
    url: str,
    table: str,
    split_column: str | None = None,
    num_partitions: int = 8,
    numeric: bool = True,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a JDBC table as ``num_partitions`` parallel bounded queries.

    split_column=None → single-partition read (small dims). Numeric split
    columns use one MIN/MAX discovery query + Spark's range partitioning;
    non-numeric use sampled range predicates. Column pruning and filter
    pushdown still apply on top (Spark's JDBC relation pushes both)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if split_column is None:
        return reader.load()
    if numeric:
        lo, hi = _query_one_row(
            spark,
            url,
            f"SELECT MIN({q(split_column)}), MAX({q(split_column)}) FROM {table}",
        )
        if lo is None:
            return reader.load()  # empty table
        return (
            reader.option("partitionColumn", split_column)
            .option("lowerBound", str(lo))
            .option("upperBound", str(int(hi) + 1))
            .option("numPartitions", str(num_partitions))
            .load()
        )
    preds = sample_shard_predicates(spark, url, table, split_column, num_partitions)
    props = dict(options or {})
    return spark.read.jdbc(url, table, predicates=preds, properties=props)
