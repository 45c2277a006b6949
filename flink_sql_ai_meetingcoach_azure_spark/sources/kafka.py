"""Kafka source/sink path: option mapping + registry-framed Avro codec.

The reference's entire transport is Kafka with Confluent-framed Avro values
(table DDL terraform/generate_personalized_commands.sh:269-288, 514-521;
produce/consume app/utils/kafka_utils.py:266-455). This module authors the
real ``spark.readStream.format("kafka")`` path:

- :func:`build_kafka_options` — pure translation of the reference's
  librdkafka-style config (``bootstrap.servers``, ``auto.offset.reset``,
  SASL) into Spark structured-streaming kafka options. Pure function →
  unit-tested without a broker.
- :func:`decode_kafka_avro` / :func:`encode_kafka_avro` — the value-column
  codec: Confluent wire frame (magic 0 + 4-byte schema id) around the
  pure-Python Avro body, schemas resolved through the
  :mod:`schema_registry` seam. These operate on ANY DataFrame with a
  ``value: binary`` column, so the full codec path is exercised brokerless
  in tests against literal framed bytes.
- :func:`read_kafka_stream` / :func:`write_kafka_stream` — the thin
  ``.format("kafka")`` wiring (needs the spark-sql-kafka jar + a broker at
  runtime; everything above it is testable without either).

Scale note: one Kafka partition maps to one Spark input partition; the
decode UDF is Arrow-batched and narrow (no shuffle), so source parallelism
is the topic's partition count — size topics accordingly, and use
``minPartitions`` to fan out hot topics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.sources.avro_codec import (
    _spark_type_for,
    confluent_wire_frame,
    decode_record,
    encode_record,
    normalize_cell,
)
from flink_sql_ai_meetingcoach_azure_spark.sources.schema_registry import (
    SchemaRegistry,
    subject_for_topic,
)

import json


@dataclass
class KafkaSourceConfig:
    """Reference consumer_config (kafka_utils.py:184-196) re-expressed for
    Spark's kafka source. ``auto.offset.reset`` becomes ``startingOffsets``
    (Spark manages offsets in the checkpoint, not a consumer group —
    ``group_id`` is optional and maps to ``kafka.group.id``)."""

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "latest"  # reference auto.offset.reset (:191)
    group_id: str | None = None  # reference 'meeting-coach-consumer-group'
    max_offsets_per_trigger: int | None = None  # backpressure bound
    min_partitions: int | None = None  # fan a hot topic out past its partition count
    fail_on_data_loss: bool = False
    sasl_username: str | None = None
    sasl_password: str | None = None
    extra: dict = field(default_factory=dict)


def build_kafka_options(cfg: KafkaSourceConfig) -> dict[str, str]:
    """Spark kafka-source options from the reference-shaped config.

    Mirrors kafka_utils.py:184-196 key-for-key where a Spark equivalent
    exists; security options use Spark's ``kafka.``-prefixed passthrough.
    """
    opts = {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "subscribe": cfg.topic,
        "startingOffsets": cfg.starting_offsets,
        "failOnDataLoss": str(cfg.fail_on_data_loss).lower(),
    }
    if cfg.group_id:
        opts["kafka.group.id"] = cfg.group_id
    if cfg.max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_offsets_per_trigger)
    if cfg.min_partitions is not None:
        opts["minPartitions"] = str(cfg.min_partitions)
    if cfg.sasl_username is not None:
        # reference: security.protocol SASL_SSL / sasl.mechanisms PLAIN (:186-189)
        opts["kafka.security.protocol"] = "SASL_SSL"
        opts["kafka.sasl.mechanism"] = "PLAIN"
        opts["kafka.sasl.jaas.config"] = (
            "org.apache.kafka.common.security.plain.PlainLoginModule required "
            f'username="{cfg.sasl_username}" password="{cfg.sasl_password}";'
        )
    opts.update({k: str(v) for k, v in cfg.extra.items()})
    return opts


def read_kafka_stream(spark: SparkSession, cfg: KafkaSourceConfig) -> DataFrame:
    """``readStream.format("kafka")`` with the mapped options. Requires the
    spark-sql-kafka jar on the classpath and a reachable broker at
    ``.start()`` time; the option construction above is the tested part."""
    return spark.readStream.format("kafka").options(**build_kafka_options(cfg)).load()


def decode_kafka_avro(
    df: DataFrame,
    registry: SchemaRegistry,
    topic: str,
    value_col: str = "value",
    output_col: str = "record",
) -> DataFrame:
    """value BINARY (Confluent-framed Avro) -> ``output_col`` STRUCT.

    The reader schema comes from the registry's latest version of
    ``<topic>-value`` (TopicNameStrategy); per-message writer schemas are
    resolved from the frame's 4-byte id against a driver-side registry
    snapshot (executors hold a broadcastable dict, not a live client —
    mirrors the reference's client-side schema cache, kafka_utils.py:383+).
    """
    _, reader_schema_str = registry.latest(subject_for_topic(topic))
    reader_schema = json.loads(reader_schema_str)
    schemas_by_id = (
        registry.snapshot_by_id() if hasattr(registry, "snapshot_by_id") else {}
    )
    out_type = _spark_type_for(reader_schema)
    field_names = [f["name"] for f in reader_schema["fields"]]

    @F.pandas_udf(out_type)
    def _dec(s: pd.Series) -> pd.DataFrame:
        import struct  # noqa: PLC0415

        rows = []
        cache: dict[int, dict] = {}
        for framed in s:
            if framed is None or len(framed) < 5 or framed[0] != 0:
                rows.append({k: None for k in field_names})
                continue
            sid = struct.unpack(">I", framed[1:5])[0]
            schema = cache.get(sid)
            if schema is None:
                schema_str = schemas_by_id.get(sid)
                if schema_str is None:
                    # Avro binary is NOT self-describing: decoding an unknown
                    # writer-schema id with the reader schema can produce
                    # silently-wrong values, so an unknown id yields a null
                    # record exactly like a malformed frame
                    rows.append({k: None for k in field_names})
                    continue
                schema = json.loads(schema_str)
                cache[sid] = schema
            rec = decode_record(schema, framed[5:])
            rows.append({k: rec.get(k) for k in field_names})
        return pd.DataFrame(rows, columns=field_names)

    return df.withColumn(output_col, _dec(F.col(value_col)))


def encode_kafka_avro(
    df: DataFrame,
    registry: SchemaRegistry,
    topic: str,
    cols: list[str] | None = None,
    output_col: str = "value",
) -> DataFrame:
    """``cols`` -> Confluent-framed Avro ``value`` BINARY.

    Schema id + writer schema resolved ONCE at plan build from the latest
    ``<topic>-value`` subject; never auto-registers
    (auto.register.schemas=False, use.latest.version=True —
    kafka_utils.py:297-301). Unknown subject raises KeyError at plan time,
    not per record."""
    schema_id, schema_str = registry.latest(subject_for_topic(topic))
    schema = json.loads(schema_str)
    cols = cols or [f["name"] for f in schema["fields"]]
    field_names = [f["name"] for f in schema["fields"]]

    @F.pandas_udf("binary")
    def _enc(s: pd.DataFrame) -> pd.Series:
        out = []
        for row in s.to_dict("records"):
            rec = {k: normalize_cell(row.get(k)) for k in field_names}
            out.append(confluent_wire_frame(encode_record(schema, rec), schema_id))
        return pd.Series(out)

    struct_col = F.struct(*[F.col(c).alias(n) for c, n in zip(cols, field_names)])
    return df.withColumn(output_col, _enc(struct_col))


def kafka_sink_value(df: DataFrame, key_col: Column | None = None) -> DataFrame:
    """Project to the (key, value) binary shape Spark's kafka sink expects."""
    out = df.select(
        *( [key_col.cast("binary").alias("key")] if key_col is not None else [] ),
        F.col("value"),
    )
    return out


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    **writer_options,
):
    """``writeStream.format("kafka")`` wiring (jar + broker at runtime)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .options(**{k: str(v) for k, v in writer_options.items()})
        .start()
    )


def open_message_stream(spark: SparkSession, source: dict) -> DataFrame:
    """Config-selected message source for the coaching pipeline: the
    reference's ``messages_conversation`` topic (:269-288) or the
    file-stream stand-in the brokerless tests use.

    ``{"type": "kafka", "bootstrap_servers", "topic", "registry", ...}`` →
    kafka read + Confluent-Avro decode + flatten to the record fields;
    ``{"type": "file", "path", "schema", "format"?}`` → file stream.
    """
    kind = source.get("type", "file")
    if kind == "kafka":
        cfg = KafkaSourceConfig(
            bootstrap_servers=source["bootstrap_servers"],
            topic=source["topic"],
            starting_offsets=source.get("starting_offsets", "latest"),
            group_id=source.get("group_id"),
            max_offsets_per_trigger=source.get("max_offsets_per_trigger"),
            extra=source.get("extra", {}),
        )
        raw = read_kafka_stream(spark, cfg)
        decoded = decode_kafka_avro(raw, source["registry"], cfg.topic)
        return decoded.select("record.*", F.col("timestamp").alias("rowtime"))
    if kind == "file":
        fmt = source.get("format", "parquet")
        reader = spark.readStream.schema(source["schema"])
        return getattr(reader, fmt)(source["path"])
    raise ValueError(f"unknown source type {kind!r}")
