"""Notification sinks — Slack / DingTalk / Feishu as executable HTTP
requests (all three speak plain HTTPS JSON; stdlib only).

Reference:
- connector-slack ``client/SlackClient.java`` — each row posts as text
  via the Web API ``chat.postMessage`` (bearer OAuth token + channel id).
- connector-dingtalk ``sink/DingTalkWriter.java`` — robot webhook with
  the documented HMAC-SHA256 signature: sign = urlencode(base64(
  hmac_sha256(secret, "{timestamp}\\n{secret}"))) appended as
  ``&timestamp=...&sign=...``; body = {"msgtype": "text",
  "text": {"content": ...}}.
- Feishu's bot webhook uses the same shape with ``msg_type`` — included
  as the family's third member (the reference ships it as an http-derived
  connector).

Timestamps are an explicit argument (deterministic tests; the caller
stamps now()).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import urllib.parse

from seatunnel_spark.sinks.streamload import StreamLoadRequest


def slack_post_message(token: str, channel: str, text: str) -> StreamLoadRequest:
    """The Web-API call SlackClient.publishMessage issues."""
    return StreamLoadRequest(
        url="https://slack.com/api/chat.postMessage",
        method="POST",
        headers={
            "Authorization": f"Bearer {token}",
            "Content-Type": "application/json; charset=utf-8",
        },
        body=json.dumps({"channel": channel, "text": text},
                        separators=(",", ":")),
    )


def dingtalk_sign(secret: str, timestamp_ms: int) -> str:
    """DingTalkWriter.getSign: urlencode(base64(hmac_sha256(secret,
    "{ts}\\n{secret}")))."""
    raw = f"{timestamp_ms}\n{secret}".encode()
    digest = hmac.new(secret.encode(), raw, hashlib.sha256).digest()
    return urllib.parse.quote_plus(base64.b64encode(digest).decode())


def dingtalk_send(
    webhook_url: str,
    text: str,
    secret: str | None = None,
    timestamp_ms: int | None = None,
) -> StreamLoadRequest:
    """Robot webhook POST; with a secret the signed query params are
    appended exactly as the reference writer builds them."""
    url = webhook_url
    if secret:
        if timestamp_ms is None:
            raise ValueError("signed dingtalk sends need timestamp_ms")
        url += f"&timestamp={int(timestamp_ms)}&sign={dingtalk_sign(secret, int(timestamp_ms))}"
    return StreamLoadRequest(
        url=url,
        method="POST",
        headers={"Content-Type": "application/json; charset=utf-8"},
        body=json.dumps({"msgtype": "text", "text": {"content": text}},
                        separators=(",", ":")),
    )


def feishu_send(webhook_url: str, text: str) -> StreamLoadRequest:
    return StreamLoadRequest(
        url=webhook_url,
        method="POST",
        headers={"Content-Type": "application/json; charset=utf-8"},
        body=json.dumps({"msg_type": "text", "content": {"text": text}},
                        separators=(",", ":")),
    )


def rows_as_messages(df, limit: int = 100) -> list[str]:
    """Rows → message strings (the reference posts row.toString(); here the
    stable JSON form). ``limit`` bounds notification floods — these sinks
    exist for alerts and job summaries, not bulk data."""
    rows = df.limit(int(limit)).collect()
    return [json.dumps(r.asDict(), separators=(",", ":"), default=str)
            for r in rows]
