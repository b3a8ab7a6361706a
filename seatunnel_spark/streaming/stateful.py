"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no user-defined stateful operators (its only state is the
source/checkpoint machinery); a Spark-native engine gets them from
Structured Streaming. This module ships the canonical CDC monitoring one:
a per-key running changelog accumulator — cumulative event counts and the
last-seen offset per repo, maintained in Spark state across micro-batches
and emitted on every update.

Pattern notes (the part that matters at scale): state is per GROUP KEY and
lives in the state store (RocksDB on a cluster); the pandas function sees
only one key's rows per call, so hot keys bound memory by their per-batch
volume, not history. Arrow batches in/out — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("cum_events", T.LongType(), False),
        T.StructField("last_seq", T.LongType(), False),
        T.StructField("batch_events", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cum_events", T.LongType(), False),
        T.StructField("last_seq", T.LongType(), False),
    ]
)


def _track(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (repo,) = key
    cum, last = state.get if state.exists else (0, -1)
    batch_n = 0
    for pdf in pdf_iter:
        batch_n += len(pdf)
        m = int(pdf["seq"].max())
        last = max(last, m)
    cum += batch_n
    state.update((cum, last))
    yield pd.DataFrame(
        {"repo": [repo], "cum_events": [cum], "last_seq": [last], "batch_events": [batch_n]}
    )


def repo_change_tracker(events: DataFrame) -> DataFrame:
    """Per-repo cumulative change counters (streaming DF in, update-mode out)."""
    return events.groupBy("repo").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
