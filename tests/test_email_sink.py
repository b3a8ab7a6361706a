"""Email sink seam: MIME message shape (subject/body/CSV attachment) and
the config dry_run surface."""

from __future__ import annotations

import email

from seatunnel_spark.sinks.email import build_message


def test_message_shape_and_csv_attachment():
    rows = [{"id": 1, "name": "a"}, {"id": 2, "name": None}]
    msg = build_message("from@x", "to@y", "nightly batch", "see attachment",
                        rows, ["id", "name"])
    assert msg["From"] == "from@x" and msg["To"] == "to@y"
    assert msg["Subject"] == "nightly batch"
    parts = list(msg.iter_attachments())
    assert len(parts) == 1
    att = parts[0]
    assert att.get_filename() == "emailsink.csv"  # the reference's filename
    body = att.get_payload(decode=True).decode()
    assert body.splitlines() == ["id,name", "1,a", "2,"]


def test_email_conf_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 3
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      EmailSink { source_table_name = "t"
                  email_from_address = "job@x"  email_to_address = "ops@y"
                  email_message_headline = "daily load"
                  email_message_content = "rows attached"
                  email_host = "smtp.x"  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    text = res["EmailSink#0"]["message"]
    parsed = email.message_from_string(text)
    assert parsed["Subject"] == "daily load"
    assert "emailsink.csv" in text
