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
import urllib.parse
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


class HttpSchemaRegistry:
    """Confluent Schema Registry REST client behind the same lookup-only
    protocol (reference: app/utils/kafka_utils.py:273-309 — fetch the
    ``<topic>-value`` subject's latest schema over HTTP, basic-auth
    key/secret, never register from the data path).

    ``auto.register.schemas=False`` semantics are structural: there is
    deliberately NO ``register()`` here — schemas are created by admin
    tooling (Terraform/Flink in the reference), the serializer only reads.

    httpx-gated like the Azure provider: absent httpx (or network) it
    raises at first CALL, never at import; tests inject a stub ``client``
    with the same ``get(url) -> response`` surface. Fetched schemas are
    cached driver-side, and :meth:`snapshot_by_id` ships that bounded cache
    into decode UDFs — executors never hold live registry connections.
    """

    def __init__(
        self,
        base_url: str,
        auth: tuple[str, str] | None = None,
        timeout_s: float = 10.0,
        client=None,
    ) -> None:
        self._base = base_url.rstrip("/")
        self._auth = auth
        self._timeout = timeout_s
        self._client = client
        self._by_id_cache: dict[int, str] = {}

    def _http(self):
        if self._client is None:
            try:
                import httpx  # noqa: PLC0415
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "HttpSchemaRegistry requires httpx; use MockSchemaRegistry "
                    "for hermetic runs"
                ) from e
            self._client = httpx.Client(timeout=self._timeout, auth=self._auth)
        return self._client

    def _get(self, path: str) -> dict:
        resp = self._http().get(self._base + path)
        if resp.status_code == 404:
            # protocol contract: unknown subject/id is KeyError (the
            # reference falls back to a hardcoded schema at the APP layer,
            # kafka_utils.py:281-294 — not here)
            raise KeyError(f"schema registry 404: {path}")
        resp.raise_for_status()
        return resp.json()

    def latest(self, subject: str) -> tuple[int, str]:
        # subjects are user-controlled names; slashes/spaces must not break
        # the path or resolve a different route
        quoted = urllib.parse.quote(subject, safe="")
        out = self._get(f"/subjects/{quoted}/versions/latest")
        sid, schema = int(out["id"]), out["schema"]
        self._by_id_cache[sid] = schema
        return sid, schema

    def by_id(self, schema_id: int) -> str:
        hit = self._by_id_cache.get(schema_id)
        if hit is None:
            hit = self._get(f"/schemas/ids/{schema_id}")["schema"]
            self._by_id_cache[schema_id] = hit
        return hit

    def snapshot_by_id(self, subjects: tuple[str, ...] = ()) -> dict[int, str]:
        """Optionally prefetch ``subjects`` (one latest() each), then return
        the bounded id->schema cache for broadcasting into decode UDFs."""
        for s in subjects:
            self.latest(s)
        return dict(self._by_id_cache)
