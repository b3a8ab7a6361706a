"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC query (LWW final state) on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator registry lives in
``seatunnel_spark.entry_queries``; every implemented operator from
SURVEY.md §2 (CDC source/sink semantics, transforms, Zeta functions,
analytics heads, and the training-data + curation/clustering suites) has
an entry, and every one of the 69 carries a DuckDB oracle (including the
unrolled-iteration k-means replay and the mapInPandas
media featurizer over its deterministic fake — PNG decode is real
stdlib code as of round 5; other codecs remain honest container-limit
stubs).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from seatunnel_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: last-writer-wins changelog collapse (the engine's core
    reduction) on /root/testdata/sf0.001."""
    return QUERIES["k5_lww_dedup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
