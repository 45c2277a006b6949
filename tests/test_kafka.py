"""Kafka source/sink path, brokerless: option mapping, Schema-Registry
seam, Confluent-framed Avro encode/decode through Spark.

The sandbox ships neither a broker nor the spark-sql-kafka jar, so
``read_kafka_stream``/``write_kafka_stream`` themselves can't execute —
everything beneath them (option translation from the reference's
consumer_config, registry subject resolution, the framed value codec over
a binary column) is exercised here against in-memory DataFrames
(reference: app/utils/kafka_utils.py:184-196, 266-455)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.sources.avro_codec import (
    confluent_wire_frame,
    encode_record,
)
from flink_sql_ai_meetingcoach_azure_spark.sources.kafka import (
    KafkaSourceConfig,
    build_kafka_options,
    decode_kafka_avro,
    encode_kafka_avro,
    open_message_stream,
)
from flink_sql_ai_meetingcoach_azure_spark.sources.schema_registry import (
    MockSchemaRegistry,
    subject_for_topic,
)

MSG_SCHEMA_STR = json.dumps(
    {
        "type": "record",
        "name": "messages_conversation_value",
        "fields": [
            {"name": "message", "type": ["null", "string"], "default": None},
            {"name": "speaker", "type": ["null", "string"], "default": None},
        ],
    }
)

NUM_SCHEMA_STR = json.dumps(
    {
        "type": "record",
        "name": "metrics",
        "fields": [
            {"name": "k", "type": ["null", "long"], "default": None},
            {"name": "x", "type": ["null", "double"], "default": None},
        ],
    }
)

TOPIC = "messages_conversation"


def _registry() -> MockSchemaRegistry:
    reg = MockSchemaRegistry()
    reg.register(subject_for_topic(TOPIC), MSG_SCHEMA_STR)
    return reg


# ---------------------------------------------------------------------------
# option mapping (reference consumer_config :184-196 -> Spark kafka options)


def test_build_kafka_options_core_mapping():
    cfg = KafkaSourceConfig(
        bootstrap_servers="broker:9092",
        topic=TOPIC,
        starting_offsets="latest",  # reference auto.offset.reset (:191)
        group_id="meeting-coach-consumer-group",
        max_offsets_per_trigger=5000,
        min_partitions=64,
    )
    opts = build_kafka_options(cfg)
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == TOPIC
    assert opts["startingOffsets"] == "latest"
    assert opts["kafka.group.id"] == "meeting-coach-consumer-group"
    assert opts["maxOffsetsPerTrigger"] == "5000"
    assert opts["minPartitions"] == "64"
    assert opts["failOnDataLoss"] == "false"
    assert "kafka.security.protocol" not in opts


def test_build_kafka_options_sasl_passthrough():
    cfg = KafkaSourceConfig(
        bootstrap_servers="b:9092", topic="t", sasl_username="u", sasl_password="p"
    )
    opts = build_kafka_options(cfg)
    # reference: SASL_SSL + PLAIN (:186-189)
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert 'username="u"' in opts["kafka.sasl.jaas.config"]


# ---------------------------------------------------------------------------
# Schema-Registry seam (auto.register.schemas=False semantics, :297-301)


def test_registry_latest_and_by_id():
    reg = _registry()
    sid, schema_str = reg.latest(f"{TOPIC}-value")
    assert sid == 1
    assert json.loads(schema_str)["name"] == "messages_conversation_value"
    assert json.loads(reg.by_id(sid)) == json.loads(schema_str)


def test_registry_unknown_subject_raises():
    reg = _registry()
    with pytest.raises(KeyError):
        reg.latest("other-topic-value")  # no auto-registration fallback here


def test_registry_same_schema_one_id():
    reg = MockSchemaRegistry()
    a = reg.register("s1-value", MSG_SCHEMA_STR)
    b = reg.register("s2-value", MSG_SCHEMA_STR)  # same schema, other subject
    c = reg.register("s3-value", NUM_SCHEMA_STR)
    assert a == b != c


# ---------------------------------------------------------------------------
# framed Avro value codec over a binary column (the kafka `value` shape)


def test_encode_decode_roundtrip_by_subject(spark):
    reg = _registry()
    df = spark.createDataFrame(
        [("pricing is too high", "prospect"), (None, "sales_rep")],
        ["message", "speaker"],
    )
    encoded = encode_kafka_avro(df, reg, TOPIC)
    val = encoded.select("value").collect()
    # wire frame: magic 0 + big-endian schema id 1
    assert all(bytes(r[0])[:5] == b"\x00\x00\x00\x00\x01" for r in val)

    decoded = decode_kafka_avro(encoded, reg, TOPIC).select("record.*")
    rows = {r["speaker"]: r["message"] for r in decoded.collect()}
    assert rows == {"prospect": "pricing is too high", "sales_rep": None}


def test_decode_resolves_writer_schema_from_frame_id(spark):
    """A message written under an OLDER registered schema id decodes via the
    per-frame writer-schema lookup, not the latest reader schema."""
    reg = MockSchemaRegistry()
    old_id = reg.register(subject_for_topic(TOPIC), MSG_SCHEMA_STR)
    reg.register(subject_for_topic(TOPIC), MSG_SCHEMA_STR)  # same here; ids stable
    body = encode_record(json.loads(MSG_SCHEMA_STR), {"message": "m", "speaker": "s"})
    framed = confluent_wire_frame(body, old_id)
    df = spark.createDataFrame([Row(value=bytearray(framed))])
    out = decode_kafka_avro(df, reg, TOPIC).select("record.*").collect()
    assert out[0]["message"] == "m"


def test_decode_bad_frame_yields_nulls(spark):
    reg = _registry()
    df = spark.createDataFrame([Row(value=bytearray(b"\x01garbage"))])
    out = decode_kafka_avro(df, reg, TOPIC).select("record.*").collect()
    assert out[0]["message"] is None and out[0]["speaker"] is None


def test_decode_unknown_schema_id_yields_nulls_not_garbage(spark):
    """Avro binary is not self-describing: a frame whose writer-schema id the
    registry snapshot doesn't know must decode to a NULL record like any
    malformed frame — silently falling back to the reader schema can produce
    well-typed garbage values with no error."""
    reg = _registry()
    body = encode_record(json.loads(MSG_SCHEMA_STR), {"message": "m", "speaker": "s"})
    framed = confluent_wire_frame(body, 999)  # id never registered
    df = spark.createDataFrame([Row(value=bytearray(framed))])
    out = decode_kafka_avro(df, reg, TOPIC).select("record.*").collect()
    assert out[0]["message"] is None and out[0]["speaker"] is None


def test_encode_null_numeric_fields_encode_as_null_branch(spark):
    """Advice fix: pandas NaN in numeric columns must take the union null
    branch (int(NaN) used to crash; double silently encoded NaN)."""
    reg = MockSchemaRegistry()
    reg.register(subject_for_topic("metrics"), NUM_SCHEMA_STR)
    df = spark.createDataFrame(
        [(1, 1.5), (None, None)], "k long, x double"
    )
    encoded = encode_kafka_avro(df, reg, "metrics")
    decoded = decode_kafka_avro(encoded, reg, "metrics").select("record.*").collect()
    by_k = {r["k"]: r["x"] for r in decoded}
    assert by_k[1] == 1.5
    assert by_k[None] is None


def test_open_message_stream_file_branch(spark, tmp_path):
    src = spark.createDataFrame([("hello", "prospect")], ["message", "speaker"])
    path = str(tmp_path / "msgs")
    src.write.parquet(path)
    stream = open_message_stream(
        spark, {"type": "file", "path": path, "schema": src.schema}
    )
    assert stream.isStreaming
    assert set(stream.columns) == {"message", "speaker"}


def test_open_message_stream_kafka_branch_builds_plan_options():
    """The kafka branch must construct the reader with the mapped options;
    without the kafka jar .load() raises — assert it fails at DATA SOURCE
    LOOKUP (proving the format('kafka') path is wired), not before."""
    from flink_sql_ai_meetingcoach_azure_spark import get_spark

    spark = get_spark("kafka-opt-test")
    reg = _registry()
    with pytest.raises(Exception) as ei:
        open_message_stream(
            spark,
            {
                "type": "kafka",
                "bootstrap_servers": "b:9092",
                "topic": TOPIC,
                "registry": reg,
            },
        )
    assert "kafka" in str(ei.value).lower()


# ---------------------------------------------------------------------------
# HTTP Schema-Registry client (stubbed transport — no network, no httpx need)


class _StubResponse:
    def __init__(self, status_code: int, payload: dict | None = None):
        self.status_code = status_code
        self._payload = payload or {}

    def json(self):
        return self._payload

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"http {self.status_code}")


class _StubClient:
    """Same get(url)->response surface as httpx.Client, serving a canned
    registry: subject latest + schemas-by-id, with a call counter."""

    def __init__(self, subjects: dict[str, tuple[int, str]], by_id: dict[int, str]):
        self.subjects, self.by_id, self.calls = subjects, by_id, []

    def get(self, url):
        self.calls.append(url)
        m = url.split("/")
        if "/subjects/" in url and url.endswith("/versions/latest"):
            sub = m[m.index("subjects") + 1]
            if sub not in self.subjects:
                return _StubResponse(404)
            sid, schema = self.subjects[sub]
            return _StubResponse(200, {"id": sid, "schema": schema, "subject": sub})
        if "/schemas/ids/" in url:
            sid = int(m[-1])
            if sid not in self.by_id:
                return _StubResponse(404)
            return _StubResponse(200, {"schema": self.by_id[sid]})
        return _StubResponse(404)


def _http_registry():
    from flink_sql_ai_meetingcoach_azure_spark.sources.schema_registry import (
        HttpSchemaRegistry,
    )

    stub = _StubClient(
        subjects={subject_for_topic(TOPIC): (7, MSG_SCHEMA_STR)},
        by_id={7: MSG_SCHEMA_STR, 3: MSG_SCHEMA_STR},
    )
    return HttpSchemaRegistry("http://sr.example:8081/", client=stub), stub


def test_http_registry_latest_fetches_topic_value_subject():
    reg, stub = _http_registry()
    sid, schema = reg.latest(subject_for_topic(TOPIC))
    assert (sid, json.loads(schema)["name"]) == (7, json.loads(MSG_SCHEMA_STR)["name"])
    assert stub.calls == [
        f"http://sr.example:8081/subjects/{TOPIC}-value/versions/latest"
    ]


def test_http_registry_url_encodes_subject():
    """Confluent subject names may contain slashes/spaces; they must be
    percent-encoded so they can't break the path or resolve another route
    (ADVICE r4)."""
    from flink_sql_ai_meetingcoach_azure_spark.sources.schema_registry import (
        HttpSchemaRegistry,
    )

    stub = _StubClient(subjects={}, by_id={})
    reg = HttpSchemaRegistry("http://sr.example:8081", client=stub)
    with pytest.raises(KeyError):
        reg.latest("weird subject/with-slash-value")
    assert stub.calls == [
        "http://sr.example:8081/subjects/"
        "weird%20subject%2Fwith-slash-value/versions/latest"
    ]


def test_http_registry_unknown_subject_is_keyerror_no_autoregister():
    """auto.register.schemas=False semantics: an unknown subject raises
    (KeyError per the protocol) — and the client has no register() at all."""
    reg, _ = _http_registry()
    with pytest.raises(KeyError):
        reg.latest("nope-value")
    assert not hasattr(reg, "register")


def test_http_registry_by_id_caches():
    reg, stub = _http_registry()
    assert json.loads(reg.by_id(3))["type"] == "record"
    assert json.loads(reg.by_id(3))["type"] == "record"
    assert len(stub.calls) == 1  # second lookup served from cache
    with pytest.raises(KeyError):
        reg.by_id(999)


def test_http_registry_drives_the_avro_codec_end_to_end(spark):
    """The HTTP client slots behind the same protocol the codec UDFs use:
    encode resolves <topic>-value latest once at plan time, decode resolves
    writer ids from the snapshot cache."""
    reg, _ = _http_registry()
    df = spark.createDataFrame([("hi", "prospect")], ["message", "speaker"])
    encoded = encode_kafka_avro(df, reg, TOPIC)
    val = bytes(encoded.select("value").head()[0])
    assert val[:5] == b"\x00\x00\x00\x00\x07"  # framed with the registry id
    reg.snapshot_by_id((subject_for_topic(TOPIC),))
    out = decode_kafka_avro(encoded, reg, TOPIC).select("record.*").head()
    assert (out["message"], out["speaker"]) == ("hi", "prospect")
