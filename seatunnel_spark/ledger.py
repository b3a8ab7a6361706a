"""Connector honesty ledger — the machine-checkable form of COVERAGE.md's
claim that every source and sink named by the reference's
``plugin-mapping.properties`` has a tested representative in this repo.

Each entry maps a plugin-mapping key (``seatunnel.source.X`` /
``seatunnel.sink.X``) to (representative module, test module). Families the
reference itself implements as one engine with thin per-service wrappers
(the file sinks, the HTTP API sources) share a representative — that is
parity, not a shortcut: e.g. every ``connector-http/connector-http-github``
class is a subclass of HttpSource with a fixed url/format
(reference: seatunnel-connectors-v2/connector-http/connector-http-github/
src/main/java/.../github/source/GithubSource.java), and every ``XxxFile``
sink is BaseFileSink over a different FileSystem scheme.

``tests/test_coverage_ledger.py`` diffs this dict against the reference
file both ways, so a reference bump that adds a connector (or a refactor
that drops a module) fails loudly instead of silently falsifying
COVERAGE.md.
"""

from __future__ import annotations

# key -> (implementation module under seatunnel_spark/, test module name)
_FILES = ("sources.files", "test_connectors")  # BaseFileSource/Sink family
_HTTP_API = ("sources.http", "test_http_source")  # HttpSource thin wrappers
_CDC = ("streaming.job", "test_e2e_cdc")  # CDC protocol engine + offsets.py dialects

PLUGIN_LEDGER: dict[str, tuple[str, str]] = {
    # ---- sources ----
    "seatunnel.source.AmazonDynamodb": ("sinks.dynamodb", "test_dynamodb_redshift"),
    "seatunnel.source.Cassandra": ("sinks.cassandra", "test_cassandra_sink"),
    "seatunnel.source.Clickhouse": ("sources.jdbc", "test_connectors"),
    "seatunnel.source.CosFile": _FILES,
    "seatunnel.source.Elasticsearch": ("sinks.elasticsearch", "test_streamload"),
    "seatunnel.source.FakeSource": ("sources.generator", "test_config_job"),
    "seatunnel.source.FtpFile": _FILES,
    "seatunnel.source.Github": _HTTP_API,
    "seatunnel.source.Gitlab": _HTTP_API,
    "seatunnel.source.GoogleSheets": ("sources.sheets", "test_sheets_sentry"),
    "seatunnel.source.HdfsFile": _FILES,
    "seatunnel.source.Hive": ("sources.hive", "test_hive_layout"),
    "seatunnel.source.Http": _HTTP_API,
    "seatunnel.source.Hudi": ("sources.hudi", "test_hudi_source"),
    "seatunnel.source.Iceberg": ("lake.table", "test_lake"),
    "seatunnel.source.InfluxDB": ("sinks.influxdb", "test_influxdb_sink"),
    "seatunnel.source.IoTDB": ("sinks.iotdb", "test_iotdb_sink"),
    "seatunnel.source.Jdbc": ("sources.jdbc", "test_connectors"),
    "seatunnel.source.Jira": _HTTP_API,
    "seatunnel.source.Kafka": ("sources.kafka", "test_kafka_seam"),
    "seatunnel.source.Klaviyo": _HTTP_API,
    "seatunnel.source.Kudu": ("sinks.kudu", "test_kudu_sink"),
    "seatunnel.source.Lemlist": _HTTP_API,
    "seatunnel.source.LocalFile": _FILES,
    "seatunnel.source.Maxcompute": ("sinks.maxcompute", "test_maxcompute_sink"),
    "seatunnel.source.MongoDB": ("sinks.mongodb", "test_mongodb_sink"),
    "seatunnel.source.MongoDB-CDC": _CDC,
    "seatunnel.source.MyHours": _HTTP_API,
    "seatunnel.source.MySQL-CDC": _CDC,
    "seatunnel.source.Neo4j": ("sinks.neo4j", "test_neo4j_sink"),
    "seatunnel.source.Notion": _HTTP_API,
    "seatunnel.source.OneSignal": _HTTP_API,
    "seatunnel.source.OpenMldb": ("sources.openmldb", "test_openmldb_source"),
    "seatunnel.source.OssFile": _FILES,
    "seatunnel.source.OssJindoFile": _FILES,
    "seatunnel.source.Paimon": ("lake.paimon", "test_paimon_backend"),
    "seatunnel.source.Persistiq": _HTTP_API,
    "seatunnel.source.Pulsar": ("sources.pulsar", "test_queue_seams"),
    "seatunnel.source.RabbitMQ": ("sources.rabbitmq", "test_queue_seams"),
    "seatunnel.source.Redis": ("sinks.redis", "test_redis_sink"),
    "seatunnel.source.Rocketmq": ("sources.rocketmq", "test_queue_seams"),
    "seatunnel.source.S3File": _FILES,
    "seatunnel.source.SftpFile": _FILES,
    "seatunnel.source.Socket": ("sources.socket", "test_socket_connector"),
    "seatunnel.source.SqlServer-CDC": _CDC,
    "seatunnel.source.StarRocks": ("sinks.streamload", "test_streamload"),
    "seatunnel.source.TDengine": ("sinks.tdengine", "test_tdengine_sink"),
    # ---- sinks ----
    "seatunnel.sink.AmazonDynamodb": ("sinks.dynamodb", "test_dynamodb_redshift"),
    "seatunnel.sink.Assert": ("sinks.assert_sink", "test_connectors"),
    "seatunnel.sink.Cassandra": ("sinks.cassandra", "test_cassandra_sink"),
    "seatunnel.sink.Clickhouse": ("sinks.jdbc", "test_config_job"),
    "seatunnel.sink.ClickhouseFile": ("sinks.jdbc", "test_connectors"),
    "seatunnel.sink.Console": ("config", "test_config_job"),
    "seatunnel.sink.CosFile": _FILES,
    "seatunnel.sink.DataHub": ("sinks.datahub", "test_datahub_sink"),
    "seatunnel.sink.DingTalk": ("sinks.webhooks", "test_webhook_sinks"),
    "seatunnel.sink.Doris": ("sinks.streamload", "test_streamload"),
    "seatunnel.sink.Elasticsearch": ("sinks.elasticsearch", "test_streamload"),
    "seatunnel.sink.EmailSink": ("sinks.email", "test_email_sink"),
    "seatunnel.sink.Feishu": ("sinks.webhooks", "test_webhook_sinks"),
    "seatunnel.sink.FtpFile": _FILES,
    "seatunnel.sink.GoogleFirestore": ("sinks.firestore", "test_firestore_sink"),
    "seatunnel.sink.Hbase": ("sinks.hbase", "test_hbase_sink"),
    "seatunnel.sink.HdfsFile": _FILES,
    "seatunnel.sink.Hive": ("sources.hive", "test_hive_layout"),
    "seatunnel.sink.Http": ("sinks.webhooks", "test_webhook_sinks"),
    "seatunnel.sink.InfluxDB": ("sinks.influxdb", "test_influxdb_sink"),
    "seatunnel.sink.IoTDB": ("sinks.iotdb", "test_iotdb_sink"),
    "seatunnel.sink.Jdbc": ("sinks.jdbc", "test_connectors"),
    "seatunnel.sink.Kafka": ("sinks.changelog", "test_connectors"),
    "seatunnel.sink.Kudu": ("sinks.kudu", "test_kudu_sink"),
    "seatunnel.sink.LocalFile": _FILES,
    "seatunnel.sink.Maxcompute": ("sinks.maxcompute", "test_maxcompute_sink"),
    "seatunnel.sink.MongoDB": ("sinks.mongodb", "test_mongodb_sink"),
    "seatunnel.sink.Neo4j": ("sinks.neo4j", "test_neo4j_sink"),
    "seatunnel.sink.OssFile": _FILES,
    "seatunnel.sink.OssJindoFile": _FILES,
    "seatunnel.sink.Paimon": ("lake.paimon", "test_paimon_backend"),
    "seatunnel.sink.RabbitMQ": ("sources.rabbitmq", "test_queue_seams"),
    "seatunnel.sink.Redis": ("sinks.redis", "test_redis_sink"),
    "seatunnel.sink.Rocketmq": ("sources.rocketmq", "test_queue_seams"),
    "seatunnel.sink.S3File": _FILES,
    "seatunnel.sink.S3Redshift": ("sinks.dynamodb", "test_dynamodb_redshift"),
    "seatunnel.sink.SelectDBCloud": ("sinks.selectdb", "test_selectdb_sink"),
    "seatunnel.sink.Sentry": ("sinks.sentry", "test_sheets_sentry"),
    "seatunnel.sink.SftpFile": _FILES,
    "seatunnel.sink.Slack": ("sinks.webhooks", "test_webhook_sinks"),
    "seatunnel.sink.Socket": ("sources.socket", "test_socket_connector"),
    "seatunnel.sink.StarRocks": ("sinks.streamload", "test_streamload"),
    "seatunnel.sink.TDengine": ("sinks.tdengine", "test_tdengine_sink"),
    "seatunnel.sink.Tablestore": ("sinks.tablestore", "test_tablestore_sink"),
}


def reference_plugin_keys(path: str = "/root/reference/plugin-mapping.properties"):
    """Parse the reference's plugin-mapping.properties into its key set.
    Returns None when the reference tree is absent (the ledger then stands
    on its own as documentation)."""
    import os

    if not os.path.isfile(path):
        return None
    keys = set()
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            keys.add(line.split("=", 1)[0].strip())
    return keys
