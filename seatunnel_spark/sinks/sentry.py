"""Sentry sink — event seam over the public store API: each row captures
as a message event (the reference writer's ``Sentry.captureMessage(row)``)
rendered as the documented ``POST {scheme}://{host}/api/{project}/store/``
request with the ``X-Sentry-Auth`` header derived from the DSN — plain
HTTPS JSON, executable with stdlib.

Reference: connector-sentry ``sink/SentrySinkWriter.java`` (row →
captureMessage; env/release from config) and ``config/SentryConfig.java``
(dsn / env / release).

DSN anatomy (public Sentry docs): ``{scheme}://{key}@{host}/{project}``.
"""

from __future__ import annotations

import json
import urllib.parse

from seatunnel_spark.sinks.streamload import StreamLoadRequest


def parse_dsn(dsn: str) -> dict:
    u = urllib.parse.urlparse(dsn)
    if not u.scheme or not u.username or not u.path.strip("/"):
        raise ValueError(f"malformed sentry dsn {dsn!r} "
                         "(need scheme://key@host/project)")
    return {
        "scheme": u.scheme,
        "key": u.username,
        "host": u.netloc.split("@", 1)[1],
        "project": u.path.strip("/"),
    }


def store_event_request(
    dsn: str,
    message: str,
    environment: str | None = None,
    release: str | None = None,
    level: str = "info",
    event_id: str | None = None,
    timestamp: str | None = None,
) -> StreamLoadRequest:
    """One captureMessage as the store-API request. ``event_id`` /
    ``timestamp`` are explicit arguments (deterministic rendering; the
    caller stamps uuid4().hex / isoformat now())."""
    d = parse_dsn(dsn)
    event = {"message": message, "level": level, "platform": "python"}
    if environment:
        event["environment"] = environment
    if release:
        event["release"] = release
    if event_id:
        event["event_id"] = event_id
    if timestamp:
        event["timestamp"] = timestamp
    auth = (
        "Sentry sentry_version=7, sentry_client=seatunnel-spark/1.0, "
        f"sentry_key={d['key']}"
    )
    return StreamLoadRequest(
        url=f"{d['scheme']}://{d['host']}/api/{d['project']}/store/",
        method="POST",
        headers={"Content-Type": "application/json", "X-Sentry-Auth": auth},
        body=json.dumps(event, separators=(",", ":")),
    )


def requests_for_batch(
    df,
    dsn: str,
    environment: str | None = None,
    release: str | None = None,
    limit: int = 100,
) -> list[StreamLoadRequest]:
    """Each row → one message event (row.toString() parity = stable JSON);
    ``limit`` bounds event floods like the webhook sinks."""
    rows = df.limit(int(limit)).collect()
    return [
        store_event_request(
            dsn,
            json.dumps(r.asDict(), separators=(",", ":"), default=str),
            environment=environment,
            release=release,
        )
        for r in rows
    ]
