"""IoTDB sink — record seam over the public REST API v2: rows map to the
reference's insertRecords shape (device / timestamp / measurements /
values, with the optional storage-group prefix), rendered as the
``POST /rest/v2/insertRecords`` JSON payload (plain HTTP basic auth —
executable with stdlib when a server exists).

Reference: connector-iotdb ``sink/IoTDBSinkClient.java`` (batch of
deviceIds/timestamps/measurementsList/valuesList flushed via
``session.insertRecords``) and ``config/SinkConfig.java`` (node_urls /
key_device / key_timestamp / key_measurement_fields / storage_group /
batch_size).
"""

from __future__ import annotations

import json

from seatunnel_spark.sinks.streamload import StreamLoadRequest, _basic_auth


def records_payload(
    rows: list[dict],
    columns: list[str],
    key_device: str,
    key_timestamp: str,
    key_measurement_fields: list[str] | None = None,
    storage_group: str | None = None,
) -> dict:
    """Rows → the insertRecords JSON body: parallel device/timestamp/
    measurement/value lists (the exact session-call shape). Measurement
    fields default to every non-device/non-timestamp column; the
    storage-group prefix is applied to devices that lack it."""
    meas = key_measurement_fields or [
        c for c in columns if c not in (key_device, key_timestamp)
    ]
    devices, timestamps, m_list, v_list = [], [], [], []
    for r in rows:
        dev = str(r.get(key_device))
        if storage_group and not dev.startswith(storage_group):
            dev = storage_group.rstrip(".") + "." + dev
        devices.append(dev)
        timestamps.append(int(r.get(key_timestamp)))
        m_list.append(list(meas))
        v_list.append([r.get(c) for c in meas])
    return {
        "devices": devices,
        "timestamps": timestamps,
        "measurements_list": m_list,
        "values_list": v_list,
        "is_aligned": False,
    }


def insert_records_request(
    node_url: str,
    payload: dict,
    username: str = "root",
    password: str = "root",
) -> StreamLoadRequest:
    return StreamLoadRequest(
        url=f"http://{node_url}/rest/v2/insertRecords",
        method="POST",
        headers={
            "Content-Type": "application/json",
            "Authorization": _basic_auth(username, password),
        },
        body=json.dumps(payload, separators=(",", ":")),
    )


def requests_for_batch(
    df,
    node_url: str,
    key_device: str,
    key_timestamp: str,
    key_measurement_fields: list[str] | None = None,
    storage_group: str | None = None,
    batch_size: int = 1024,
    username: str = "root",
    password: str = "root",
) -> list[StreamLoadRequest]:
    cols = [c for c in df.columns if c not in ("op", "seq")]
    rows = [r.asDict() for r in df.select(*cols).collect()]
    return [
        insert_records_request(
            node_url,
            records_payload(rows[i : i + batch_size], cols, key_device,
                            key_timestamp, key_measurement_fields, storage_group),
            username, password,
        )
        for i in range(0, max(len(rows), 1), batch_size)
    ]
