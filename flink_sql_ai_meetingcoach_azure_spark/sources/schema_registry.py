"""Schema-Registry seam for the Avro wire path.

The reference resolves schemas from Confluent Schema Registry by SUBJECT
using TopicNameStrategy (``<topic>-value``) and NEVER auto-registers from
the data path — ``auto.register.schemas: False, use.latest.version: True``
(app/utils/kafka_utils.py:273-309 produce side; :383-455 consume side
resolves the writer schema from the 4-byte id in the Confluent wire frame).

This module reproduces those semantics behind a small protocol so the
engine's encode/decode UDFs are registry-backed without requiring a live
registry: :class:`MockSchemaRegistry` is the dict-backed stand-in (register
is test/admin setup, mirroring schemas being created by Terraform/Flink in
the reference, NOT by the serializer); an HTTP-backed implementation slots
in behind the same two lookup methods.
"""

from __future__ import annotations

import json
from typing import Protocol


def subject_for_topic(topic: str) -> str:
    """TopicNameStrategy: value schemas live under ``<topic>-value``
    (kafka_utils.py:277)."""
    return f"{topic}-value"


class SchemaRegistry(Protocol):
    """Lookup-only protocol — the data path never registers schemas
    (``auto.register.schemas: False``, kafka_utils.py:297-301)."""

    def latest(self, subject: str) -> tuple[int, str]:
        """(schema_id, schema_json_str) of the subject's latest version.
        Raises KeyError for an unknown subject — the reference falls back
        to a hardcoded schema at the APP layer (:281-294), not here."""
        ...

    def by_id(self, schema_id: int) -> str:
        """schema_json_str for a writer-schema id from a wire frame."""
        ...


class MockSchemaRegistry:
    """Dict-backed registry with Confluent-like id assignment (global ids,
    monotonically increasing, one id per distinct schema string)."""

    def __init__(self) -> None:
        self._by_subject: dict[str, list[int]] = {}
        self._by_id: dict[int, str] = {}
        self._id_for_schema: dict[str, int] = {}
        self._next_id = 1

    def register(self, subject: str, schema_str: str) -> int:
        """Admin/test setup — the serializer path never calls this
        (auto.register.schemas=False semantics)."""
        # normalize so semantically-identical JSON gets one id
        canonical = json.dumps(json.loads(schema_str), sort_keys=True, separators=(",", ":"))
        sid = self._id_for_schema.get(canonical)
        if sid is None:
            sid = self._next_id
            self._next_id += 1
            self._id_for_schema[canonical] = sid
            self._by_id[sid] = canonical
        self._by_subject.setdefault(subject, []).append(sid)
        return sid

    def latest(self, subject: str) -> tuple[int, str]:
        versions = self._by_subject.get(subject)
        if not versions:
            raise KeyError(f"subject {subject!r} not found (auto-register is disabled)")
        sid = versions[-1]
        return sid, self._by_id[sid]

    def by_id(self, schema_id: int) -> str:
        if schema_id not in self._by_id:
            raise KeyError(f"schema id {schema_id} not found")
        return self._by_id[schema_id]

    def snapshot_by_id(self) -> dict[int, str]:
        """Driver-side snapshot shipped into decode UDFs (executors must not
        hold live registry connections; a bounded id->schema dict is the
        broadcastable equivalent of the reference's client-side cache)."""
        return dict(self._by_id)
