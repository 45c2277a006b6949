"""AzureOpenAIProvider transport logic with a stubbed HTTP client — the
429 retry/backoff path, payload shapes, and the hermetic-env guard. No
network involved."""

from __future__ import annotations

import pytest

from flink_sql_ai_meetingcoach_azure_spark.models.providers import AzureOpenAIProvider


class _Resp:
    def __init__(self, status_code, payload=None):
        self.status_code = status_code
        self._payload = payload or {}

    def json(self):
        return self._payload

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")


class _Client:
    """Scripted responses; records requests."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def post(self, url, json=None, headers=None):
        self.calls.append((url, json))
        return self.script.pop(0)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_retry_on_429_then_success(monkeypatch):
    p = AzureOpenAIProvider(endpoint="https://x", api_key="k", max_retries=3)
    ok = _Resp(200, {"data": [{"index": 0, "embedding": [0.1, 0.2]}]})
    client = _Client([_Resp(429), _Resp(429), ok])
    monkeypatch.setattr(p, "_client", lambda: client)
    monkeypatch.setattr("time.sleep", lambda s: None)
    out = p.embed(["hello"])
    assert out == [[0.1, 0.2]]
    assert len(client.calls) == 3  # two 429s retried


def test_429_exhausts_retries(monkeypatch):
    p = AzureOpenAIProvider(endpoint="https://x", api_key="k", max_retries=1)
    client = _Client([_Resp(429), _Resp(429)])
    monkeypatch.setattr(p, "_client", lambda: client)
    monkeypatch.setattr("time.sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="HTTP 429"):
        p.embed(["hello"])


def test_embed_orders_by_index(monkeypatch):
    p = AzureOpenAIProvider(endpoint="https://x", api_key="k")
    resp = _Resp(200, {"data": [
        {"index": 1, "embedding": [1.0]}, {"index": 0, "embedding": [0.0]},
    ]})
    client = _Client([resp])
    monkeypatch.setattr(p, "_client", lambda: client)
    out = p.embed(["a", "b"])
    assert out == [[0.0], [1.0]]  # registry order restored from index field
    url, body = client.calls[0]
    assert "embeddings?api-version=" in url
    assert body == {"input": ["a", "b"]}


def test_generate_includes_system_prompt(monkeypatch):
    p = AzureOpenAIProvider(endpoint="https://x", api_key="k", system_prompt="SYS")
    resp = _Resp(200, {"choices": [{"message": {"content": "out"}}]})
    client = _Client([resp])
    monkeypatch.setattr(p, "_client", lambda: client)
    assert p.generate(["hi"]) == ["out"]
    _, body = client.calls[0]
    assert body["messages"][0] == {"role": "system", "content": "SYS"}
    assert body["messages"][1] == {"role": "user", "content": "hi"}


def test_none_prompt_becomes_empty(monkeypatch):
    p = AzureOpenAIProvider(endpoint="https://x", api_key="k")
    resp = _Resp(200, {"choices": [{"message": {"content": "out"}}]})
    client = _Client([resp])
    monkeypatch.setattr(p, "_client", lambda: client)
    p.generate([None])
    _, body = client.calls[0]
    assert body["messages"][-1]["content"] == ""
