"""JDBC upsert sink: distributed stage + one set-based MERGE.

Reference: connector-jdbc sink — the dialect-specific upsert DML
(MysqlDialect.getUpsertStatement → INSERT .. ON DUPLICATE KEY UPDATE,
PostgresDialect → INSERT .. ON CONFLICT DO UPDATE, plus the generic
MERGE INTO path) executed by BufferedBatchStatementExecutor per checkpoint.

Spark-first mapping: instead of row-buffered prepared statements on each
worker (per-row latency, connection churn), the batch is staged with the
distributed ``df.write.jdbc`` (every executor streams its partition over its
own connection) and then ONE set-based upsert DML moves staging → target
inside the database — the database's own merge engine does the keyed update,
which is the scale-correct shape: network transfer is parallel, the merge is
a single transactional statement (the lake sink's 2PC analog: stage, then
atomically publish). Exactly-once across retries comes from the epoch ledger
upstream (the staged table is TRUNCATE-replaced per epoch, and the merge is
idempotent: re-running it converges to the same target state).

Dialect SQL is generated here and unit-tested as text; only Derby is
executable in this sandbox (it ships in Spark's classpath) — the e2e
roundtrip test runs against embedded Derby.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.sources.jdbc import driver_connection


class AnsiMergeDialect:
    """MERGE INTO (ANSI / Derby / Oracle / SQLServer-style)."""

    name = "ansi"
    # extra CREATE TABLE suffix for staging tables (createTableOptions) —
    # dialects whose server rejects a bare CREATE TABLE override this
    staging_create_options: str | None = None

    def q(self, ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def upsert_from_staging(
        self, target: str, staging: str, cols: list[str], key: list[str]
    ) -> str:
        qc = self.q
        on = " AND ".join(f"t.{qc(k)} = s.{qc(k)}" for k in key)
        non_key = [c for c in cols if c not in key]
        sets = ", ".join(f"{qc(c)} = s.{qc(c)}" for c in non_key)
        ins_cols = ", ".join(qc(c) for c in cols)
        ins_vals = ", ".join(f"s.{qc(c)}" for c in cols)
        stmt = f"MERGE INTO {target} t USING {staging} s ON {on}"
        if sets:
            stmt += f" WHEN MATCHED THEN UPDATE SET {sets}"
        stmt += f" WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        return stmt

    def delete_from_staging(
        self, target: str, staging: str, key: list[str], lightweight: bool = False
    ) -> str:
        """Keyed delete of every staged key — the reference's per-row
        ``DELETE FROM t WHERE k = ?`` (SqlUtils.getDeleteStatement)
        re-expressed set-based. Correlated EXISTS rather than a row-value
        IN: Derby (and several MERGE-dialect servers) reject multi-column
        row constructors in IN predicates. ``lightweight`` is a
        ClickHouse-ism, ignored here."""
        qc = self.q
        cond = " AND ".join(f"s.{qc(k)} = {target}.{qc(k)}" for k in key)
        return (
            f"DELETE FROM {target} WHERE EXISTS "
            f"(SELECT 1 FROM {staging} s WHERE {cond})"
        )


class MySqlDialect(AnsiMergeDialect):
    """INSERT .. ON DUPLICATE KEY UPDATE (MysqlDialect.getUpsertStatement)."""

    name = "mysql"

    def q(self, ident: str) -> str:
        return "`" + ident.replace("`", "``") + "`"

    def upsert_from_staging(self, target, staging, cols, key):
        qc = self.q
        ins_cols = ", ".join(qc(c) for c in cols)
        non_key = [c for c in cols if c not in key]
        # alias must not be NEW — reserved in MySQL 8 (trigger row alias)
        sets = ", ".join(f"{qc(c)} = src.{qc(c)}" for c in non_key) or ", ".join(
            f"{qc(k)} = src.{qc(k)}" for k in key
        )
        return (
            f"INSERT INTO {target} ({ins_cols}) "
            f"SELECT {ins_cols} FROM {staging} AS src "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )


class PostgresDialect(AnsiMergeDialect):
    """INSERT .. ON CONFLICT DO UPDATE (PostgresDialect.getUpsertStatement)."""

    name = "postgres"

    def upsert_from_staging(self, target, staging, cols, key):
        qc = self.q
        ins_cols = ", ".join(qc(c) for c in cols)
        conflict = ", ".join(qc(k) for k in key)
        non_key = [c for c in cols if c not in key]
        sets = ", ".join(f"{qc(c)} = EXCLUDED.{qc(c)}" for c in non_key)
        stmt = (
            f"INSERT INTO {target} ({ins_cols}) "
            f"SELECT {ins_cols} FROM {staging} "
            f"ON CONFLICT ({conflict}) "
        )
        stmt += f"DO UPDATE SET {sets}" if sets else "DO NOTHING"
        return stmt


class OracleDialect(AnsiMergeDialect):
    """MERGE INTO ... USING (...) ON (...) — OracleDialect.getUpsertStatement
    (reference binds :field rows from a buffer; here the staged table IS the
    USING source, same statement shape set-based). Oracle requires the ON
    condition parenthesized and has no table alias AS keyword."""

    name = "oracle"

    def upsert_from_staging(self, target, staging, cols, key):
        qc = self.q
        on = " AND ".join(f"t.{qc(k)} = s.{qc(k)}" for k in key)
        non_key = [c for c in cols if c not in key]
        sets = ", ".join(f"t.{qc(c)} = s.{qc(c)}" for c in non_key)
        ins_cols = ", ".join(qc(c) for c in cols)
        ins_vals = ", ".join(f"s.{qc(c)}" for c in cols)
        stmt = f"MERGE INTO {target} t USING {staging} s ON ({on})"
        if sets:
            stmt += f" WHEN MATCHED THEN UPDATE SET {sets}"
        stmt += f" WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        return stmt


class SqlServerDialect(AnsiMergeDialect):
    """MERGE with bracket quoting and the mandatory terminating semicolon
    (SqlServerDialect.getUpsertStatement)."""

    name = "sqlserver"

    def q(self, ident: str) -> str:
        return "[" + ident.replace("]", "]]") + "]"

    def upsert_from_staging(self, target, staging, cols, key):
        qc = self.q
        on = " AND ".join(f"[t].{qc(k)} = [s].{qc(k)}" for k in key)
        non_key = [c for c in cols if c not in key]
        sets = ", ".join(f"[t].{qc(c)} = [s].{qc(c)}" for c in non_key)
        ins_cols = ", ".join(qc(c) for c in cols)
        ins_vals = ", ".join(f"[s].{qc(c)}" for c in cols)
        stmt = f"MERGE INTO {target} AS [t] USING {staging} AS [s] ON ({on})"
        if sets:
            stmt += f" WHEN MATCHED THEN UPDATE SET {sets}"
        stmt += f" WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals});"
        return stmt


class ClickhouseDialect(AnsiMergeDialect):
    """ClickHouse has no MERGE/ON CONFLICT: the reference upserts into a
    ReplacingMergeTree by PLAIN INSERT — the engine's background merge keeps
    the newest row per ORDER BY key (JdbcBatchStatementExecutorBuilder.java:
    100-105 'ReplacingMergeTree Update Row: upsert row by order-by-keys'),
    and deletes are lightweight DELETEs gated by the experimental setting
    (SqlUtils.java:47-55, ClickhouseSinkWriter.java:200). Feed it
    LWW-reduced batches (one row per key) so insert-as-upsert is exact."""

    name = "clickhouse"
    # ClickHouse rejects CREATE TABLE without an ENGINE clause, and Spark's
    # JDBC writer emits none — staging tables need it appended via
    # createTableOptions. MergeTree with an empty sort key is the cheapest
    # engine that supports the set-based upsert/delete reads that follow.
    staging_create_options = "ENGINE = MergeTree() ORDER BY tuple()"

    def q(self, ident: str) -> str:
        return "`" + ident.replace("`", "\\`") + "`"

    def upsert_from_staging(self, target, staging, cols, key):
        qc = self.q
        ins_cols = ", ".join(qc(c) for c in cols)
        return (
            f"INSERT INTO {target} ({ins_cols}) "
            f"SELECT {ins_cols} FROM {staging}"
        )

    def delete_from_staging(
        self, target: str, staging: str, key: list[str], lightweight: bool = True
    ) -> str:
        """Keyed delete of every staged key — the reference's per-row
        ``DELETE FROM t WHERE k = ?`` (SqlUtils.getLightweightDeleteStatement)
        re-expressed set-based over the staged table."""
        qc = self.q
        keys = ", ".join(qc(k) for k in key)
        stmt = (
            f"DELETE FROM {target} WHERE ({keys}) IN "
            f"(SELECT {keys} FROM {staging})"
        )
        if lightweight:
            stmt += " SETTINGS allow_experimental_lightweight_delete = 1"
        return stmt


DIALECTS = {
    d.name: d()
    for d in (
        AnsiMergeDialect,
        MySqlDialect,
        PostgresDialect,
        OracleDialect,
        SqlServerDialect,
        ClickhouseDialect,
    )
}


def jdbc_upsert_write(
    df: DataFrame,
    url: str,
    target: str,
    key: list[str],
    dialect: AnsiMergeDialect | str = "ansi",
    staging: str | None = None,
    staging_column_types: str | None = None,
) -> str:
    """Upsert ``df`` into ``target`` (which must exist with a key/unique
    constraint on ``key``): distributed stage, one set-based upsert, drop
    staging. Returns the executed upsert SQL (for observability/tests).

    ``staging_column_types`` forwards to Spark's createTableColumnTypes so
    staged string columns can be VARCHAR instead of the dialect's LOB default
    (Derby forbids comparing/merging CLOBs)."""
    if isinstance(dialect, str):
        dialect = DIALECTS[dialect]
    staging = staging or f"{target}_STAGE"
    cols = df.columns
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .option("truncate", "true")  # epoch-idempotent restage
        .mode("overwrite")
    )
    if staging_column_types:
        writer = writer.option("createTableColumnTypes", staging_column_types)
    if dialect.staging_create_options:
        writer = writer.option("createTableOptions", dialect.staging_create_options)
    writer.save()

    sql = dialect.upsert_from_staging(target, staging, cols, key)
    conn = driver_connection(df.sparkSession, url)
    try:
        st = conn.createStatement()
        st.execute(sql)
        try:
            st.execute(f"DROP TABLE {staging}")
        except Exception:
            pass  # staging cleanup is best-effort; next run truncates it
        st.close()
    finally:
        conn.close()
    return sql
