"""Kafka broker seam: the exact ``readStream.format("kafka")`` option dicts
for every reference start/stop mode — tested as text, executable verbatim.

Reference: connector-kafka — StartMode.java (EARLIEST / LATEST / TIMESTAMP /
SPECIFIC_OFFSETS / GROUP_OFFSETS), KafkaSource.java:138-170 (mode parsing +
timestamp validation), KafkaSourceSplitEnumerator.java:139-160 (enumerator
resolves TIMESTAMP via ``consumer.offsetsForTimes`` and seeks). On Spark the
broker transport and offset resolution are built in: ``startingTimestamp``
IS ``offsetsForTimes`` (the Kafka source resolves it per partition at query
start), ``startingOffsets`` JSON is the SPECIFIC_OFFSETS seek, and bounded
``read`` with ``endingOffsets``/``endingTimestamp`` is the StopMode surface.
What the engine owns is the option-dict generation — the same
dialect-as-text pattern as ``lake/iceberg.py`` and ``sinks/jdbc.py``, unit-
tested without a broker (this sandbox ships no Kafka jar or broker; the
queue e2e runs through the file-backed stand-in unchanged).

GROUP_OFFSETS is the one reference start mode Spark's transport cannot
express: Spark's Kafka source NEVER consults a consumer group's committed
offsets — ``kafka.group.id`` only names the group it registers as;
``startingOffsets`` alone governs the first start, and the streaming
checkpoint governs every start after that. The reference's
KafkaSourceSplitEnumerator GROUP_OFFSETS contract (resume from the group's
last commit) therefore has no faithful mapping, and pretending otherwise
would silently reprocess the whole topic on first start. ``group_offsets``
here raises unless the caller opts into an explicit first-start fallback
(``group_offsets_fallback="earliest"|"latest"``), which emits that
startingOffsets plus ``kafka.group.id`` and relies on the checkpoint for
all real resume semantics.
"""

from __future__ import annotations

import json

START_MODES = ("earliest", "latest", "timestamp", "specific_offsets", "group_offsets")
STOP_MODES = ("never", "latest", "timestamp", "specific_offsets")


def kafka_read_options(
    bootstrap_servers: str,
    topic: str,
    start_mode: str = "earliest",
    start_timestamp_ms: int | None = None,
    start_offsets: dict[int, int] | None = None,
    consumer_group: str | None = None,
    fail_on_data_loss: bool = False,
    pattern: bool = False,
    group_offsets_fallback: str | None = None,
) -> dict[str, str]:
    """The ``spark.readStream.format("kafka").options(**these)`` dict for a
    changelog topic. ``start_offsets`` is {partition: offset} (the
    SPECIFIC_OFFSETS shape); ``pattern=True`` subscribes by regex (the
    reference's topic PATTERN option)."""
    if start_mode not in START_MODES:
        raise ValueError(f"unknown start_mode {start_mode!r}; use one of {START_MODES}")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        ("subscribePattern" if pattern else "subscribe"): topic,
        # the reference treats missing data as a restartable condition, not
        # a poison pill (its enumerator re-seeks); Spark's equivalent knob
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if start_mode == "earliest":
        opts["startingOffsets"] = "earliest"
    elif start_mode == "latest":
        opts["startingOffsets"] = "latest"
    elif start_mode == "timestamp":
        if start_timestamp_ms is None or start_timestamp_ms < 0:
            # KafkaSource.java:145-149 rejects negative/missing timestamps
            raise ValueError("start_mode=timestamp requires start_timestamp_ms >= 0")
        # one timestamp across all partitions — Spark resolves it per
        # partition via offsetsForTimes at query start, exactly
        # KafkaSourceSplitEnumerator.java:148's listOffsets(ts) path
        opts["startingTimestamp"] = str(int(start_timestamp_ms))
    elif start_mode == "specific_offsets":
        if not start_offsets:
            raise ValueError("start_mode=specific_offsets requires start_offsets")
        opts["startingOffsets"] = json.dumps(
            {topic: {str(int(p)): int(o) for p, o in sorted(start_offsets.items())}}
        )
    elif start_mode == "group_offsets":
        if not consumer_group:
            raise ValueError("start_mode=group_offsets requires consumer_group")
        # Spark's Kafka source does not read the group's committed offsets:
        # startingOffsets always governs the first start (see module
        # docstring). Refuse rather than silently reprocess the topic.
        if group_offsets_fallback not in ("earliest", "latest"):
            raise ValueError(
                "start_mode=group_offsets is not supported on the Spark "
                "transport: Spark never resumes from a consumer group's "
                "committed offsets (kafka.group.id only names the group). "
                "Pass group_offsets_fallback='earliest'|'latest' to pick an "
                "explicit first-start position; the streaming checkpoint "
                "owns resume from then on."
            )
        opts["kafka.group.id"] = consumer_group
        opts["startingOffsets"] = group_offsets_fallback
    if consumer_group and "kafka.group.id" not in opts:
        opts["groupIdPrefix"] = consumer_group
    return opts


def kafka_stop_options(
    topic: str,
    stop_mode: str = "never",
    stop_timestamp_ms: int | None = None,
    stop_offsets: dict[int, int] | None = None,
) -> dict[str, str]:
    """StopMode surface (bounded replay): options for a BATCH
    ``spark.read.format("kafka")`` — streaming reads never stop (NEVER);
    a bounded read to LATEST / a timestamp / specific offsets is the
    reference's StopMode.java contract, which the engine's
    ``trigger(availableNow=True)`` replay mode composes with."""
    if stop_mode not in STOP_MODES:
        raise ValueError(f"unknown stop_mode {stop_mode!r}; use one of {STOP_MODES}")
    if stop_mode == "never":
        return {}
    if stop_mode == "latest":
        return {"endingOffsets": "latest"}
    if stop_mode == "timestamp":
        if stop_timestamp_ms is None or stop_timestamp_ms < 0:
            raise ValueError("stop_mode=timestamp requires stop_timestamp_ms >= 0")
        return {"endingTimestamp": str(int(stop_timestamp_ms))}
    if not stop_offsets:
        raise ValueError("stop_mode=specific_offsets requires stop_offsets")
    return {
        "endingOffsets": json.dumps(
            {topic: {str(int(p)): int(o) for p, o in sorted(stop_offsets.items())}}
        )
    }


def kafka_value_stream(spark, options: dict[str, str], max_offsets_per_trigger: int | None = None):
    """The one readStream line the queue module's docstring promises: a
    Kafka topic as a ``value: string`` stream, drop-in where the file-backed
    stand-in's ``readStream.text(dir)`` goes. Requires the Kafka jar on the
    session (not shipped in this sandbox — covered by option-text tests)."""
    reader = spark.readStream.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    if max_offsets_per_trigger is not None:
        # rate limit — the analog of the file stand-in's maxFilesPerTrigger
        reader = reader.option("maxOffsetsPerTrigger", str(int(max_offsets_per_trigger)))
    return reader.load().selectExpr("CAST(value AS STRING) AS value")
