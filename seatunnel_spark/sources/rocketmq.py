"""RocketMQ broker seam: the exact consumer-properties dict the reference's
enumerator semantics require, generated per start mode — tested as text.

Reference: connector-rocketmq ``config/ConsumerConfig.java`` (StartMode
CONSUME_FROM_LAST_OFFSET / CONSUME_FROM_FIRST_OFFSET /
CONSUME_FROM_GROUP_OFFSETS / CONSUME_FROM_TIMESTAMP /
CONSUME_FROM_SPECIFIC_OFFSETS, ``start.mode.offsets``) and
``source/RocketMqSourceSplitEnumerator.java`` (listOffsets per
ConsumeFromWhere, seek to specific offsets).

Unlike Kafka/Pulsar there is no maintained Structured Streaming DataSource
for RocketMQ, so this seam renders the PUBLIC RocketMQ client consumer
configuration (namesrvAddr / consumerGroup / consumeFromWhere /
consumeTimestamp — org.apache.rocketmq.common.consumer.ConsumeFromWhere
spellings) that any ingestion bridge (a RocketMQ→file/Kafka relay, or a
custom receiver) applies verbatim; specific offsets ride as an explicit
{queueId: offset} seek map the way the reference's enumerator seeks.

Honesty notes:
- GROUP_OFFSETS is faithful HERE (unlike the Kafka transport): a RocketMQ
  consumer natively resumes its group's committed offsets when they exist;
  ``consumeFromWhere`` only governs the first start of a brand-new group.
  That is exactly the reference's CONSUME_FROM_GROUP_OFFSETS contract.
- CONSUME_FROM_TIMESTAMP uses the client's ``consumeTimestamp`` format
  (yyyyMMddHHmmss, broker-local time) — the ms-epoch input is formatted
  as UTC; deployments in other broker timezones must adjust.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

START_MODES = (
    "CONSUME_FROM_LAST_OFFSET",
    "CONSUME_FROM_FIRST_OFFSET",
    "CONSUME_FROM_GROUP_OFFSETS",
    "CONSUME_FROM_TIMESTAMP",
    "CONSUME_FROM_SPECIFIC_OFFSETS",
)


def rocketmq_consumer_options(
    name_server: str,
    topic: str,
    consumer_group: str,
    start_mode: str = "CONSUME_FROM_GROUP_OFFSETS",
    start_timestamp_ms: int | None = None,
    start_offsets: dict[int, int] | None = None,
) -> dict[str, str]:
    """Consumer-properties dict for one changelog topic. ``start_offsets``
    is {queueId: offset} (the reference's start.mode.offsets shape)."""
    mode = start_mode.upper()
    if mode not in START_MODES:
        raise ValueError(f"unknown start_mode {start_mode!r}; use one of {START_MODES}")
    if not consumer_group:
        raise ValueError("rocketmq needs consumer_group (offsets are stored per group)")
    opts = {
        "namesrvAddr": name_server,
        "consumerGroup": consumer_group,
        "topic": topic,
    }
    if mode == "CONSUME_FROM_FIRST_OFFSET":
        opts["consumeFromWhere"] = "CONSUME_FROM_FIRST_OFFSET"
    elif mode == "CONSUME_FROM_LAST_OFFSET":
        opts["consumeFromWhere"] = "CONSUME_FROM_LAST_OFFSET"
    elif mode == "CONSUME_FROM_GROUP_OFFSETS":
        # committed group offsets take precedence natively; LAST_OFFSET is
        # the client's first-start fallback for a brand-new group (the same
        # default the reference's enumerator applies)
        opts["consumeFromWhere"] = "CONSUME_FROM_LAST_OFFSET"
    elif mode == "CONSUME_FROM_TIMESTAMP":
        if start_timestamp_ms is None or start_timestamp_ms < 0:
            raise ValueError(
                "start_mode=CONSUME_FROM_TIMESTAMP requires start_timestamp_ms >= 0"
            )
        opts["consumeFromWhere"] = "CONSUME_FROM_TIMESTAMP"
        opts["consumeTimestamp"] = datetime.fromtimestamp(
            start_timestamp_ms / 1000.0, tz=timezone.utc
        ).strftime("%Y%m%d%H%M%S")
    else:  # CONSUME_FROM_SPECIFIC_OFFSETS
        if not start_offsets:
            raise ValueError(
                "start_mode=CONSUME_FROM_SPECIFIC_OFFSETS requires start_offsets"
            )
        # the enumerator seeks each queue explicitly; no consumeFromWhere
        opts["seekOffsets"] = json.dumps(
            {str(int(q)): int(o) for q, o in sorted(start_offsets.items())}
        )
    return opts
