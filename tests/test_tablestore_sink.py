"""Tablestore sink: PlainBuffer encode/decode round-trip with checksum
verification, the hand-rolled protobuf envelope, OTS request signing,
and a config e2e (dry_run and executing against a local server)."""

from __future__ import annotations

import base64
import hashlib
import hmac
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from seatunnel_spark.sinks.tablestore import (
    HEADER,
    batch_write_request,
    batch_write_row_body,
    crc8,
    decode_plainbuffer,
    encode_put_row,
    ots_signature,
)

DATE = "2026-08-17T12:00:00.000Z"


def test_crc8_poly07_reference_values():
    # crc-8 with poly 0x07, init 0: published check value for "123456789"
    assert crc8(b"123456789") == 0xF4
    assert crc8(b"") == 0
    assert crc8(b"\x00") == 0


def test_plainbuffer_round_trip_all_types():
    pk = [("uid", 42), ("part", "p-7")]
    attrs = [("name", "o'hara"), ("score", 1.5), ("ok", True),
             ("blob", b"\x00\xff"), ("gone", None)]
    buf = encode_put_row(pk, attrs)
    assert struct.unpack_from("<I", buf, 0)[0] == HEADER
    out = decode_plainbuffer(buf)  # verifies every cell + row checksum
    assert out["pk"] == pk
    # null attribute skipped (reference convertColumn returns null)
    assert out["attrs"] == [("name", "o'hara"), ("score", 1.5),
                            ("ok", True), ("blob", b"\x00\xff")]
    with pytest.raises(ValueError, match="primary key"):
        encode_put_row([("uid", None)], [])
    # corruption is caught by the checksums
    bad = bytearray(buf)
    bad[12] ^= 0x01
    with pytest.raises(ValueError, match="checksum"):
        decode_plainbuffer(bytes(bad))


def test_protobuf_envelope_shape():
    rc = encode_put_row([("id", 1)], [("v", "x")])
    body = batch_write_row_body("t1", [rc, rc])
    def read_varint(buf, pos):
        n = shift = 0
        while True:
            b = buf[pos]; pos += 1
            n |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                return n, pos

    # field 1 (tables), wire type 2, length covers the rest
    assert body[0] == (1 << 3) | 2
    ln, pos = read_varint(body, 1)
    assert pos + ln == len(body)
    # table message: field 1 = table_name "t1"
    assert body[pos] == (1 << 3) | 2
    ln2, pos2 = read_varint(body, pos + 1)
    assert body[pos2 : pos2 + ln2] == b"t1"
    # both row_change payloads embedded verbatim
    assert body.count(rc) == 2


def test_ots_signature_documented_algorithm():
    headers = {
        "x-ots-date": DATE, "x-ots-apiversion": "2015-12-31",
        "x-ots-accesskeyid": "AK", "x-ots-instancename": "inst",
        "x-ots-contentmd5": "md5==", "Content-Type": "application/x.pb2",
        "x-ots-signature": "ignored",
    }
    to_sign = ("/BatchWriteRow\nPOST\n\n"
               "x-ots-accesskeyid:AK\n"
               "x-ots-apiversion:2015-12-31\n"
               "x-ots-contentmd5:md5==\n"
               f"x-ots-date:{DATE}\n"
               "x-ots-instancename:inst\n")
    want = base64.b64encode(
        hmac.new(b"SECRET", to_sign.encode(), hashlib.sha1).digest()
    ).decode()
    assert ots_signature("SECRET", "BatchWriteRow", headers) == want
    req = batch_write_request("https://inst.ots.example", "inst", "AK",
                              "SECRET", b"BODY", DATE)
    assert req.url == "https://inst.ots.example/BatchWriteRow"
    assert req.headers["x-ots-contentmd5"] == base64.b64encode(
        hashlib.md5(b"BODY").digest()).decode()
    assert req.headers["x-ots-signature"]


class _Ots(BaseHTTPRequestHandler):
    bodies = []

    def log_message(self, *a):
        pass

    def do_POST(self):
        assert self.path == "/BatchWriteRow"
        body = self.rfile.read(int(self.headers["Content-Length"]))
        assert self.headers["x-ots-contentmd5"] == base64.b64encode(
            hashlib.md5(body).digest()).decode()
        # recompute the signature server-side: must match
        hdrs = {k: v for k, v in self.headers.items()}
        assert self.headers["x-ots-signature"] == ots_signature(
            "SECRET", "BatchWriteRow", hdrs)
        type(self).bodies.append(body)
        self.send_response(200)
        self.send_header("Content-Length", "2")
        self.end_headers()
        self.wfile.write(b"{}")


def test_tablestore_sink_through_config(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Ots)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      FakeSource {{ result_table_name = "s"  row.num = 7
                    schema = {{ fields {{ id = int  name = string }} }} }}
    }}
    sink {{
      Tablestore {{ source_table_name = "s"
                    end_point = "{base}"  instance_name = "inst"
                    access_key_id = "AK"  access_key_secret = "SECRET"
                    table = "t1"  primary_keys = "id"  batch_size = 4
                    date = "{DATE}" }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    assert res["Tablestore#0"]["written"]
    assert len(_Ots.bodies) == 2  # 7 rows / batch 4
    # walk the protobuf envelope: every embedded PlainBuffer row_change
    # decodes with valid checksums and carries the declared pk
    def fields(buf):
        pos = 0
        while pos < len(buf):
            tag = buf[pos]; pos += 1
            num, wire = tag >> 3, tag & 7
            if wire == 2:
                ln = shift = 0
                while True:
                    b = buf[pos]; pos += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                yield num, buf[pos : pos + ln]
                pos += ln
            elif wire == 0:
                v = shift = 0
                while True:
                    b = buf[pos]; pos += 1
                    v |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                yield num, v
            else:
                raise AssertionError(f"unexpected wire type {wire}")

    found = 0
    for _, tbl in fields(_Ots.bodies[0]):
        for num, row_msg in fields(tbl):
            if num != 2:
                continue
            for fnum, val in fields(row_msg):
                if fnum == 2:  # row_change bytes
                    row = decode_plainbuffer(val)
                    assert row["pk"][0][0] == "id"
                    found += 1
    assert found == 4
    srv.shutdown()


def test_tablestore_dry_run_and_validation(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "s"  row.num = 3
                   schema = { fields { id = int  name = string } } }
    }
    sink {
      Tablestore { source_table_name = "s"
                   end_point = "https://inst.ots.example"
                   instance_name = "inst"  access_key_id = "AK"
                   access_key_secret = "SECRET"  table = "t1"
                   primary_keys = "id"  dry_run = true
                   date = "%s" }
    }
    """ % DATE
    res = run_job(spark, load_job_config(conf))
    out = res["Tablestore#0"]
    assert out["dry_run"] and len(out["requests"]) == 1
    assert out["requests"][0]["url"].endswith("/BatchWriteRow")
    assert base64.b64decode(out["requests"][0]["body_b64"])
