"""MaxCompute sink over the public ODPS REST surface: signature
algorithm, SQL/XML rendering, chunking, and a config e2e (dry_run and
executing against a local server)."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import threading
import xml.etree.ElementTree as ET
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from seatunnel_spark.sinks.maxcompute import (
    insert_sql,
    instance_xml,
    odps_signature,
    submit_instance_request,
)

DATE = "Mon, 17 Aug 2026 12:00:00 GMT"


def test_signature_matches_documented_algorithm():
    # hand-computed: base64(hmac-sha1(key, "POST\nMD5\ntype\ndate\n
    # x-odps-a:1\n/projects/p/instances"))
    sign_str = ("POST\nABC\napplication/xml\n" + DATE +
                "\nx-odps-a:1\n/projects/p/instances")
    want = base64.b64encode(
        hmac.new(b"k3y", sign_str.encode(), hashlib.sha1).digest()
    ).decode()
    got = odps_signature(
        "k3y", "post", "ABC", "application/xml", DATE,
        "/projects/p/instances",
        odps_headers={"X-ODPS-A": " 1 ", "Content-Length": "9"},
    )
    assert got == want  # x-odps-* sorted+lowercased, others excluded


def test_insert_sql_rendering():
    sql = insert_sql(
        "proj.t1", ["id", "name", "f"],
        [{"id": 1, "name": "o'hara", "f": 1.5}, {"id": 2, "name": None, "f": None}],
        partition_spec="ds=20260817,region='bj'",
    )
    assert sql == (
        "INSERT INTO TABLE proj.t1 PARTITION (ds='20260817', region='bj') "
        "(id, name, f) VALUES (1, 'o\\'hara', 1.5), (2, NULL, NULL);"
    )
    assert insert_sql("p.t", ["id"], [{"id": 1}], overwrite=True).startswith(
        "INSERT OVERWRITE TABLE p.t "
    )
    with pytest.raises(ValueError, match="partition_spec"):
        insert_sql("p.t", ["id"], [{"id": 1}], partition_spec="dsonly")


def test_instance_xml_and_request():
    xml = instance_xml("select 1", settings='{"a":"b"}')
    root = ET.fromstring(xml)
    sql_el = root.find("./Job/Tasks/SQL")
    assert sql_el.find("Name").text == "AnonymousSQLTask"
    assert sql_el.find("Query").text == "select 1;"  # ';' appended
    props = {p.find("Name").text: p.find("Value").text
             for p in sql_el.findall("./Config/Property")}
    assert json.loads(props["settings"]) == {"a": "b"}
    req = submit_instance_request(
        "http://odps.example", "p1", "AKID", "SECRET", xml, DATE)
    assert req.url == "http://odps.example/projects/p1/instances"
    assert req.headers["Content-MD5"] == hashlib.md5(xml.encode()).hexdigest().upper()
    assert req.headers["Authorization"].startswith("ODPS AKID:")
    # signature binds the body digest
    req2 = submit_instance_request(
        "http://odps.example", "p1", "AKID", "SECRET", xml + " ", DATE)
    assert req2.headers["Authorization"] != req.headers["Authorization"]


class _Odps(BaseHTTPRequestHandler):
    seen = []

    def log_message(self, *a):
        pass

    def do_POST(self):
        assert self.path == "/projects/p1/instances"
        assert self.headers["Authorization"].startswith("ODPS AKID:")
        body = self.rfile.read(int(self.headers["Content-Length"]))
        assert hashlib.md5(body).hexdigest().upper() == self.headers["Content-MD5"]
        type(self).seen.append(body.decode())
        resp = b"<Instance><Status>Running</Status></Instance>"
        self.send_response(201)
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)


def test_maxcompute_sink_through_config(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Odps)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      FakeSource {{ result_table_name = "s"  row.num = 5
                    schema = {{ fields {{ id = int  name = string }} }} }}
    }}
    sink {{
      Maxcompute {{ source_table_name = "s"
                    accessId = "AKID"  accesskey = "SECRET"
                    endpoint = "{base}"  project = "p1"  table_name = "t1"
                    split_row = 3
                    date = "{DATE}" }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    out = res["Maxcompute#0"]
    assert out["written"] and len(out["responses"]) == 2  # 5 rows / split 3
    # each submitted instance carries a CDATA INSERT for its chunk
    q0 = ET.fromstring(_Odps.seen[0]).find("./Job/Tasks/SQL/Query").text
    assert q0.startswith("INSERT INTO TABLE p1.t1 (id, name) VALUES")
    assert len(_Odps.seen) == 2
    srv.shutdown()

    # dry_run renders without touching the network
    conf_dry = conf.replace('date = "' + DATE + '"',
                            'date = "' + DATE + '"  dry_run = true')
    res2 = run_job(spark, load_job_config(conf_dry))
    reqs = res2["Maxcompute#0"]["requests"]
    assert res2["Maxcompute#0"]["dry_run"] and len(reqs) == 2
    assert reqs[0]["url"].endswith("/projects/p1/instances")
