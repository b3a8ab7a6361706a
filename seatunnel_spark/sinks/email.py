"""Email sink — message seam: build the exact MIME message the reference
writer sends (headline subject + body text + the batch as a CSV
attachment named ``emailsink.csv``), via stdlib ``email``; ``smtplib``
delivers it when an SMTP endpoint exists, and the config sink's dry_run
returns the rendered RFC-5322 text.

Reference: connector-email ``sink/EmailSinkWriter.java`` — rows buffer
into a CSV file, the message carries ``email_message_headline`` as
subject and ``email_message_content`` as body, authenticated with
``email_authorization_code`` against ``email_host``/
``email_transport_protocol``.
"""

from __future__ import annotations

import csv
import io
from email.message import EmailMessage


def build_message(
    from_address: str,
    to_address: str,
    subject: str,
    content: str,
    rows: list[dict],
    columns: list[str],
    attachment_name: str = "emailsink.csv",
) -> EmailMessage:
    """Rows → the reference's message shape: text body + CSV attachment
    (header row + one line per row, the EmailSinkWriter buffer)."""
    msg = EmailMessage()
    msg["From"] = from_address
    msg["To"] = to_address
    msg["Subject"] = subject
    msg.set_content(content)
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(columns)
    for r in rows:
        w.writerow(["" if r.get(c) is None else r.get(c) for c in columns])
    msg.add_attachment(
        buf.getvalue().encode(),
        maintype="text",
        subtype="csv",
        filename=attachment_name,
    )
    return msg


def send_message(
    msg: EmailMessage,
    host: str,
    port: int = 465,
    password: str | None = None,
    use_ssl: bool = True,
    timeout_s: float = 30.0,
) -> None:
    """SMTP delivery (smtplib): SSL by default (the reference's smtps
    transport), login with the authorization code when given."""
    import smtplib

    cls = smtplib.SMTP_SSL if use_ssl else smtplib.SMTP
    with cls(host, int(port), timeout=timeout_s) as s:
        if password is not None:
            s.login(msg["From"], password)
        s.send_message(msg)


def message_for_batch(df, from_address: str, to_address: str,
                      subject: str, content: str, limit: int = 10_000) -> EmailMessage:
    cols = [c for c in df.columns if c not in ("op", "seq")]
    rows = [r.asDict() for r in df.select(*cols).limit(int(limit)).collect()]
    return build_message(from_address, to_address, subject, content, rows, cols)
