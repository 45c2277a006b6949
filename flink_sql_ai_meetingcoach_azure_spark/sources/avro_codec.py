"""Minimal Avro binary codec + Spark UDFs for the reference's record shapes.

The reference produces/consumes Kafka Avro messages with Schema-Registry
schemas (app/utils/kafka_utils.py:266-455; fallback schemas :283-294 and
:362-374): flat records whose fields are nullable-union strings — e.g.
``{"type":"record","fields":[{"name":"message","type":["null","string"],
"default":null}, ...]}``. This container ships neither the spark-avro
datasource jar nor a Python avro library, so this module implements the
Avro 1.x *binary encoding* (per the public Avro specification) for the
subset those pipelines need:

    record, string, bytes, int/long (zigzag varint), float, double,
    boolean, null, 2-branch ``["null", X]`` unions, array<T>.

``to_avro_udf`` / ``from_avro_udf`` wrap the codec as Spark UDFs so
streams can round-trip the same wire bytes the reference's
``AvroSerializer`` emits (minus the 5-byte Confluent wire-format header,
which is registry metadata, not Avro; ``confluent_wire_frame`` adds it).

Scale note: the codec runs row-wise inside an Arrow-batched pandas UDF;
encoding is append-only byte building with no per-field allocation beyond
the output buffer — the hot loop is pure-Python but branch-light. For
bulk archival the parquet path is always preferred; Avro exists for
wire-compatibility with Kafka consumers.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# binary primitives (Avro spec: zigzag varint longs, length-prefixed strings)


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while (n & ~0x7F) != 0:
        buf.write(bytes([(n & 0x7F) | 0x80]))
        n >>= 7
    buf.write(bytes([n]))


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _encode_value(buf: io.BytesIO, typ: Any, v: Any) -> None:
    if isinstance(typ, list):  # union — branch index then value
        if v is None and "null" in typ:
            _write_long(buf, typ.index("null"))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        _write_long(buf, branch)
        _encode_value(buf, typ[branch], v)
        return
    if isinstance(typ, dict):
        if typ["type"] == "record":
            for f in typ["fields"]:
                _encode_value(buf, f["type"], None if v is None else v.get(f["name"]))
            return
        if typ["type"] == "array":
            # Arrow batches deliver array columns as numpy arrays, whose
            # truthiness is ambiguous — test None explicitly
            items = [] if v is None else list(v)
            if items:
                _write_long(buf, len(items))
                for it in items:
                    _encode_value(buf, typ["items"], it)
            _write_long(buf, 0)
            return
        raise ValueError(f"unsupported complex type {typ['type']!r}")
    if typ == "null":
        return
    if typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
        return
    if typ in ("int", "long"):
        _write_long(buf, int(v))
        return
    if typ == "float":
        buf.write(struct.pack("<f", float(v)))
        return
    if typ == "double":
        buf.write(struct.pack("<d", float(v)))
        return
    if typ in ("string", "bytes"):
        raw = v.encode("utf-8") if typ == "string" else bytes(v)
        _write_long(buf, len(raw))
        buf.write(raw)
        return
    raise ValueError(f"unsupported type {typ!r}")


def _decode_value(buf: io.BytesIO, typ: Any) -> Any:
    if isinstance(typ, list):
        return _decode_value(buf, typ[_read_long(buf)])
    if isinstance(typ, dict):
        if typ["type"] == "record":
            return {f["name"]: _decode_value(buf, f["type"]) for f in typ["fields"]}
        if typ["type"] == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec-permitted)
                    _read_long(buf)
                    n = -n
                out.extend(_decode_value(buf, typ["items"]) for _ in range(n))
        raise ValueError(f"unsupported complex type {typ['type']!r}")
    if typ == "null":
        return None
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ in ("int", "long"):
        return _read_long(buf)
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if typ == "bytes":
        return buf.read(_read_long(buf))
    raise ValueError(f"unsupported type {typ!r}")


def encode_record(schema: dict, record: dict | None) -> bytes:
    buf = io.BytesIO()
    _encode_value(buf, schema, record)
    return buf.getvalue()


def decode_record(schema: dict, payload: bytes) -> dict:
    return _decode_value(io.BytesIO(payload), schema)


def normalize_cell(v: Any) -> Any:
    """pandas renders null numeric cells as NaN (float dtype) / NaT, which
    the union null-check ``v is None`` would miss — ``int(NaN)`` crashes and
    double silently encodes NaN for null. Map scalar NaN/NaT to None; arrays
    keep their value (``pd.isna`` on an array is elementwise, not a scalar
    truth)."""
    if isinstance(v, (list, tuple)) or (type(v).__module__ == "numpy" and getattr(v, "ndim", 0)):
        return v
    return None if pd.isna(v) else v


def confluent_wire_frame(payload: bytes, schema_id: int) -> bytes:
    """Confluent Schema-Registry wire format: magic 0 + 4-byte schema id
    big-endian + Avro body (what the reference's AvroSerializer emits)."""
    return b"\x00" + struct.pack(">I", schema_id) + payload


def strip_confluent_frame(framed: bytes) -> tuple[int, bytes]:
    if not framed or framed[0] != 0:
        raise ValueError("not Confluent wire format (magic byte != 0)")
    return struct.unpack(">I", framed[1:5])[0], framed[5:]


# ---------------------------------------------------------------------------
# Spark surface


def _spark_type_for(typ: Any) -> T.DataType:
    if isinstance(typ, list):
        non_null = next(t for t in typ if t != "null")
        return _spark_type_for(non_null)
    if isinstance(typ, dict):
        if typ["type"] == "record":
            return T.StructType(
                [T.StructField(f["name"], _spark_type_for(f["type"]), True) for f in typ["fields"]]
            )
        if typ["type"] == "array":
            return T.ArrayType(_spark_type_for(typ["items"]), True)
        raise ValueError(typ)
    return {
        "string": T.StringType(),
        "bytes": T.BinaryType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "boolean": T.BooleanType(),
    }[typ]


def to_avro_udf(schema_json: str):
    """STRUCT -> BINARY pandas UDF encoding each row as Avro binary."""
    schema = json.loads(schema_json)
    field_names = [f["name"] for f in schema["fields"]]

    @F.pandas_udf(T.BinaryType())
    def _enc(s: pd.DataFrame) -> pd.Series:
        return pd.Series(
            [
                encode_record(schema, {k: normalize_cell(row[k]) for k in field_names})
                for row in s.to_dict("records")
            ]
        )

    return _enc


def from_avro_udf(schema_json: str):
    """BINARY -> STRUCT pandas UDF decoding Avro binary rows."""
    schema = json.loads(schema_json)
    out_type = _spark_type_for(schema)

    @F.pandas_udf(out_type)
    def _dec(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([decode_record(schema, b) for b in s])

    return _dec


def avro_encode(df, schema_json: str, cols: list[str] | None = None) -> Column:
    """Convenience: encode ``cols`` (default: schema field order) of ``df``."""
    schema = json.loads(schema_json)
    cols = cols or [f["name"] for f in schema["fields"]]
    return to_avro_udf(schema_json)(F.struct(*[F.col(c) for c in cols]))
