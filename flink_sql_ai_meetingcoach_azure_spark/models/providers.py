"""Model providers behind one interface.

The reference declares two remote models in Flink DDL
(CREATE MODEL openaiembed, task=embedding,
 terraform/generate_personalized_commands.sh:215-223;
 CREATE MODEL coaching_response_generator, task=text_generation with the
 system prompt embedded in the DDL, :229-259) and invokes them row-wise with
 ``ML_PREDICT`` via LATERAL TABLE joins.

Providers here implement the same tasks:

- :class:`MockProvider` — deterministic, hermetic (no network). The
  reference has NO mock/test path (SURVEY.md §5.1: no test suite at all);
  this is what makes the whole pipeline testable and benchmarkable.
- :class:`AzureOpenAIProvider` — real endpoint calls over HTTP with bounded
  concurrency and 429 retry/backoff, mirroring the deployment shape
  (terraform/main.tf:230-261: embedding capacity 120, LLM capacity 30).
  Gated behind import-try: absent httpx/network it raises at call time,
  never at import time.

All providers are **batch-oriented** (list[str] -> list[...]) so the pandas
UDF wrapper amortizes per-call overhead across an Arrow batch.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
from dataclasses import dataclass, field


def mock_embedding(text: str | None, dim: int = 1536) -> list[float]:
    """Deterministic pseudo-embedding: md5-seeded unit vector.

    Each 16-dim block derives from md5(text + block index) bytes mapped to
    [-1, 1]; the result is L2-normalized so cosine similarity is a dot
    product. Identical input -> identical vector, across processes.
    """
    if text is None:
        text = ""
    vals: list[float] = []
    n_blocks = (dim + 15) // 16
    for b in range(n_blocks):
        digest = hashlib.md5(f"{text}\x00{b}".encode("utf-8", "surrogatepass")).digest()
        # 16 bytes -> 16 floats in [-1, 1]
        vals.extend((v - 127.5) / 127.5 for v in digest)
    vals = vals[:dim]
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


def _mock_coaching_json(prompt: str | None) -> str:
    """Deterministic generation: a well-formed coaching JSON echoing inputs.

    Output conforms to the system-prompt contract
    (generate_personalized_commands.sh:240-249): suggested_response,
    sources[3] with document_index/document_id/title/path/full_text/
    used_excerpt, reasoning. Wrapped in ```json fences to exercise the
    client-side cleanup parser (app/static/script.js:953-961).
    """
    prompt = prompt or ""
    # pull "Document i: <id>\n<chunk>" lines back out of the prompt
    sources = []
    for i in range(1, 4):
        marker = f"Document {i}: "
        start = prompt.find(marker)
        doc_id, chunk = "", ""
        if start >= 0:
            seg = prompt[start + len(marker) :]
            nl = seg.find("\n")
            doc_id = seg[:nl] if nl >= 0 else seg
            rest = seg[nl + 1 :] if nl >= 0 else ""
            chunk = rest.split("\n\n", 1)[0]
        title = doc_id.rsplit("/", 1)[-1]
        path = doc_id.rsplit("/", 1)[0] if "/" in doc_id else ""
        sources.append(
            {
                "document_index": i,
                "document_id": doc_id,
                "title": title,
                "path": path,
                "full_text": chunk,
                "used_excerpt": chunk[:80],
            }
        )
    msg_marker = "## PROSPECT MESSAGE: "
    msg = prompt.split("\n", 1)[0]
    if msg.startswith(msg_marker):
        msg = msg[len(msg_marker) :]
    h = hashlib.md5(prompt.encode("utf-8", "surrogatepass")).hexdigest()[:8]
    payload = {
        "suggested_response": f"[mock:{h}] Address the point: {msg[:120]}",
        "sources": sources,
        "reasoning": f"Top documents matched the message (mock {h}).",
    }
    return "```json\n" + json.dumps(payload) + "\n```"


@dataclass
class MockProvider:
    """Deterministic hermetic provider for both tasks."""

    dim: int = 1536

    def embed(self, texts: list[str | None]) -> list[list[float]]:
        return [mock_embedding(t, self.dim) for t in texts]

    def generate(self, prompts: list[str | None]) -> list[str]:
        return [_mock_coaching_json(p) for p in prompts]


def semantic_mock_embedding(
    text: str | None, dim: int = 256, stopwords: frozenset[str] | None = None
) -> list[float]:
    """Deterministic SEMANTIC-ish embedding: hashing-TF bag of words.

    Each non-stopword token hashes (md5) to a dimension bucket with
    sublinear tf weight; the vector is L2-normalized, so cosine ≈
    vocabulary overlap. Unlike :func:`mock_embedding` (whole-text hash —
    deliberately non-semantic, only exact match retrieves), texts SHARING
    WORDS land near each other: enough signal for retrieval goldens like
    "pricing objection retrieves the pricing playbook"
    (sample-data/README.md demo concept) without any model dependency.
    """
    if not text:
        return [0.0] * dim
    counts: dict[int, int] = {}
    for tok in text.lower().split():
        tok = tok.strip(".,;:!?()[]\"'`*#")
        if not tok or (stopwords and tok in stopwords):
            continue
        b = int(hashlib.md5(tok.encode("utf-8", "surrogatepass")).hexdigest()[:8], 16) % dim
        counts[b] = counts.get(b, 0) + 1
    vals = [0.0] * dim
    for b, c in counts.items():
        vals[b] = 1.0 + math.log(c)  # sublinear tf
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


_EN_STOP = frozenset(
    "a an and are as at be but by for from has have i in is it its of on or that the "
    "this to was we what which will with you your our".split()
)


@dataclass
class SemanticMockProvider:
    """Deterministic hermetic provider whose embedding space is lexical
    (hashing-TF): near-duplicates and topically-overlapping texts get high
    cosine. Use for semantic-retrieval goldens; :class:`MockProvider` stays
    the default (exact-match-only, maximally collision-free)."""

    dim: int = 256

    def embed(self, texts: list[str | None]) -> list[list[float]]:
        return [semantic_mock_embedding(t, self.dim, _EN_STOP) for t in texts]

    def generate(self, prompts: list[str | None]) -> list[str]:
        return [_mock_coaching_json(p) for p in prompts]


def azure_provider_factory(name: str, options: dict[str, str]):
    """``CREATE MODEL ... WITH(...)`` options → a live
    :class:`AzureOpenAIProvider` — plug into
    :class:`~..ddl.FlinkStatementSession` as ``provider_factory`` to make
    the reference's model DDL (generate_personalized_commands.sh:215-259)
    build real endpoints. ``azureopenai.connection`` names a Confluent-side
    connection object holding endpoint+key out-of-band; the equivalent here
    is the provider's env-var config (.env.template:18-23 mirror)."""
    kw: dict[str, str] = {}
    task = options.get("task", "embedding")
    deployment = options.get("azureopenai.deployment") or options.get(
        "azureopenai.model_version"
    )
    if deployment:
        kw["chat_deployment" if task == "text_generation" else "embed_deployment"] = (
            deployment
        )
    if "azureopenai.system_prompt" in options:
        kw["system_prompt"] = options["azureopenai.system_prompt"]
    if "azureopenai.api_version" in options:
        kw["api_version"] = options["azureopenai.api_version"]
    return AzureOpenAIProvider(**kw)


@dataclass
class AzureOpenAIProvider:
    """Azure OpenAI over REST (embeddings + chat completions).

    Config mirrors the reference's .env.template:18-23 (endpoint, api key,
    deployment names). Bounded concurrency + exponential backoff on 429
    (the reference instead relies on fixed endpoint capacity,
    terraform/main.tf:242,258).
    """

    endpoint: str = field(default_factory=lambda: os.environ.get("AZURE_OPENAI_ENDPOINT", ""))
    api_key: str = field(default_factory=lambda: os.environ.get("AZURE_OPENAI_API_KEY", ""))
    embed_deployment: str = "text-embedding-ada-002"
    chat_deployment: str = "gpt-4"
    api_version: str = "2024-02-01"
    system_prompt: str = ""
    max_retries: int = 3
    timeout_s: float = 30.0

    def _client(self):
        try:
            import httpx  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "AzureOpenAIProvider requires httpx; use MockProvider for hermetic runs"
            ) from e
        return httpx.Client(timeout=self.timeout_s)

    def _post(self, client, url: str, body: dict) -> dict:
        import time  # noqa: PLC0415

        for attempt in range(self.max_retries + 1):
            resp = client.post(url, json=body, headers={"api-key": self.api_key})
            if resp.status_code == 429 and attempt < self.max_retries:
                time.sleep(min(2**attempt, 8))
                continue
            resp.raise_for_status()
            return resp.json()
        raise RuntimeError("unreachable")

    def embed(self, texts: list[str | None]) -> list[list[float]]:
        url = (
            f"{self.endpoint}/openai/deployments/{self.embed_deployment}"
            f"/embeddings?api-version={self.api_version}"
        )
        with self._client() as client:
            out = self._post(client, url, {"input": [t or "" for t in texts]})
        return [d["embedding"] for d in sorted(out["data"], key=lambda d: d["index"])]

    def generate(self, prompts: list[str | None]) -> list[str]:
        url = (
            f"{self.endpoint}/openai/deployments/{self.chat_deployment}"
            f"/chat/completions?api-version={self.api_version}"
        )
        results: list[str] = []
        with self._client() as client:
            for p in prompts:
                msgs = []
                if self.system_prompt:
                    msgs.append({"role": "system", "content": self.system_prompt})
                msgs.append({"role": "user", "content": p or ""})
                out = self._post(client, url, {"messages": msgs})
                results.append(out["choices"][0]["message"]["content"])
        return results
