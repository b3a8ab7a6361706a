"""Pulsar broker seam: exact ``readStream.format("pulsar")`` option dicts
for every reference cursor mode — tested as text, executable verbatim with
the public StreamNative pulsar-spark connector on the session classpath
(not shipped in this sandbox; same dialect-as-text pattern as
``sources/kafka.py``).

Reference: connector-pulsar ``config/SourceProperties.java`` — StartMode
EARLIEST / LATEST / SUBSCRIPTION / TIMESTAMP (``cursor.startup.mode``,
``cursor.startup.timestamp``, ``cursor.reset.mode``), StopMode NEVER /
LATEST / TIMESTAMP (``cursor.stop.mode``, ``cursor.stop.timestamp``),
``topic`` semicolon lists vs ``topic-pattern``, ``subscription.name``.

Transport notes (honesty ledger, like kafka.py's group_offsets):
- SUBSCRIPTION mode IS faithful here — unlike Kafka consumer groups,
  pulsar-spark's ``predefinedSubscription`` genuinely resumes the named
  subscription's cursor, with ``startingOffsets`` (from the reference's
  cursor.reset.mode) applying only when the subscription does not exist
  yet. This is exactly the reference's SUBSCRIPTION + CURSOR_RESET_MODE
  contract.
- TIMESTAMP start maps to ``startingTime`` (epoch ms) — the connector
  resolves it per partition broker-side, the analog of the reference's
  admin ``resetCursor(timestamp)``.
"""

from __future__ import annotations

import json

START_MODES = ("earliest", "latest", "subscription", "timestamp")
STOP_MODES = ("never", "latest", "timestamp")


def pulsar_read_options(
    service_url: str,
    admin_url: str,
    topic: str,
    start_mode: str = "latest",
    start_timestamp_ms: int | None = None,
    subscription_name: str | None = None,
    cursor_reset_mode: str = "latest",
    pattern: bool = False,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The ``spark.readStream.format("pulsar").options(**these)`` dict.
    ``topic`` accepts the reference's semicolon-separated list; it becomes
    the connector's comma-separated ``topics`` (or ``topicsPattern`` when
    ``pattern``)."""
    if start_mode not in START_MODES:
        raise ValueError(f"unknown start_mode {start_mode!r}; use one of {START_MODES}")
    opts = {
        "service.url": service_url,
        "admin.url": admin_url,
        ("topicsPattern" if pattern else "topics"): (
            topic if pattern else ",".join(t for t in topic.split(";") if t)
        ),
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if start_mode == "earliest":
        opts["startingOffsets"] = "earliest"
    elif start_mode == "latest":
        opts["startingOffsets"] = "latest"
    elif start_mode == "timestamp":
        if start_timestamp_ms is None or start_timestamp_ms < 0:
            raise ValueError("start_mode=timestamp requires start_timestamp_ms >= 0")
        opts["startingTime"] = str(int(start_timestamp_ms))
    else:  # subscription
        if not subscription_name:
            raise ValueError("start_mode=subscription requires subscription_name")
        if cursor_reset_mode not in ("earliest", "latest"):
            # SourceProperties.CURSOR_RESET_MODE only admits these two
            raise ValueError("cursor_reset_mode must be earliest|latest")
        opts["predefinedSubscription"] = subscription_name
        opts["startingOffsets"] = cursor_reset_mode
    return opts


def pulsar_stop_options(
    stop_mode: str = "never",
    stop_timestamp_ms: int | None = None,
) -> dict[str, str]:
    """StopMode surface for a bounded ``spark.read.format("pulsar")``."""
    if stop_mode not in STOP_MODES:
        raise ValueError(f"unknown stop_mode {stop_mode!r}; use one of {STOP_MODES}")
    if stop_mode == "never":
        return {}
    if stop_mode == "latest":
        return {"endingOffsets": "latest"}
    if stop_timestamp_ms is None or stop_timestamp_ms < 0:
        raise ValueError("stop_mode=timestamp requires stop_timestamp_ms >= 0")
    return {"endingTime": str(int(stop_timestamp_ms))}


def pulsar_value_stream(spark, options: dict[str, str]):
    """Pulsar topic as a ``value: string`` stream — drop-in where the
    file-backed stand-in's readStream.text goes (requires the pulsar-spark
    connector jar; covered by option-text tests in this sandbox)."""
    reader = spark.readStream.format("pulsar")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load().selectExpr("CAST(value AS STRING) AS value")


def specific_offsets_json(message_ids: dict[str, str]) -> str:
    """SPECIFIC offsets helper: topic → messageId string, serialized the
    way pulsar-spark's startingOffsets JSON expects."""
    return json.dumps(dict(sorted(message_ids.items())))
