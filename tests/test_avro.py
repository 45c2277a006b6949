"""Avro binary codec: spec-vector checks, roundtrips, Spark UDF surface,
Confluent wire framing (reference: kafka_utils.py Avro produce/consume)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.sources.avro_codec import (
    avro_encode,
    confluent_wire_frame,
    decode_record,
    encode_record,
    from_avro_udf,
    strip_confluent_frame,
)

# the reference's fallback schema for messages (kafka_utils.py:283-294 shape)
MSG_SCHEMA = {
    "type": "record",
    "name": "msg",
    "fields": [
        {"name": "message", "type": ["null", "string"], "default": None},
        {"name": "speaker", "type": ["null", "string"], "default": None},
    ],
}

EMB_SCHEMA = {
    "type": "record",
    "name": "emb",
    "fields": [
        {"name": "document_id", "type": ["null", "string"], "default": None},
        {"name": "chunks", "type": ["null", "string"], "default": None},
        {"name": "embedding", "type": ["null", {"type": "array", "items": "float"}],
         "default": None},
    ],
}


def test_spec_vectors():
    """Byte-exact vectors from the public Avro spec: zigzag longs and
    length-prefixed strings."""
    s = {"type": "record", "name": "r",
         "fields": [{"name": "n", "type": "long"}, {"name": "s", "type": "string"}]}
    # zigzag: 1 -> 0x02 ; "foo" -> 0x06 'f' 'o' 'o'
    assert encode_record(s, {"n": 1, "s": "foo"}) == b"\x02\x06foo"
    # zigzag: -1 -> 0x01 ; 64 -> 0x80 0x01 (multi-byte varint)
    assert encode_record(s, {"n": -1, "s": ""}) == b"\x01\x00"
    assert encode_record(s, {"n": 64, "s": ""}) == b"\x80\x01\x00"


def test_roundtrip_nullable_union():
    rec = {"message": "hello ü 中", "speaker": None}
    assert decode_record(MSG_SCHEMA, encode_record(MSG_SCHEMA, rec)) == rec
    # null branch encodes as just the union index
    assert encode_record(MSG_SCHEMA, {"message": None, "speaker": None}) == b"\x00\x00"


def test_roundtrip_float_array():
    rec = {"document_id": "d", "chunks": "c", "embedding": [1.0, -0.5, 0.25]}
    out = decode_record(EMB_SCHEMA, encode_record(EMB_SCHEMA, rec))
    assert out["embedding"] == [1.0, -0.5, 0.25]


def test_confluent_wire_frame():
    body = encode_record(MSG_SCHEMA, {"message": "x", "speaker": "prospect"})
    framed = confluent_wire_frame(body, schema_id=7)
    assert framed[0] == 0 and len(framed) == len(body) + 5
    sid, stripped = strip_confluent_frame(framed)
    assert sid == 7 and stripped == body
    with pytest.raises(ValueError):
        strip_confluent_frame(b"\x01junk")


def test_spark_udf_roundtrip(spark):
    sj = json.dumps(MSG_SCHEMA)
    df = spark.createDataFrame(
        [("hello", "prospect"), (None, "salesperson")], ["message", "speaker"]
    )
    enc = df.select(avro_encode(df, sj).alias("value"))
    dec = enc.select(from_avro_udf(sj)(F.col("value")).alias("r")).select("r.*")
    rows = sorted(dec.collect(), key=lambda r: (r["speaker"] or ""))
    assert [(r["message"], r["speaker"]) for r in rows] == [
        ("hello", "prospect"), (None, "salesperson")
    ]


def test_spark_udf_embedding_schema(spark):
    sj = json.dumps(EMB_SCHEMA)
    df = spark.createDataFrame(
        [("d1", "chunk text", [0.1, 0.2])],
        "document_id string, chunks string, embedding array<float>",
    )
    enc = df.select(avro_encode(df, sj).alias("value"))
    dec = enc.select(from_avro_udf(sj)(F.col("value")).alias("r")).select("r.*")
    r = dec.head()
    assert r["document_id"] == "d1"
    assert len(r["embedding"]) == 2
