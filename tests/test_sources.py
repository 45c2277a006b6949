"""Sources: markdown corpus loader (S7-S9) and CSV response cache (S12/P7)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.sources.cache import ResponseCache
from flink_sql_ai_meetingcoach_azure_spark.sources.documents import load_markdown_corpus


def test_markdown_corpus_loader(spark, tmp_path):
    (tmp_path / "cat_a").mkdir()
    (tmp_path / "cat_b").mkdir()
    (tmp_path / "cat_a" / "one.md").write_text("# Doc one\ncontent A")
    (tmp_path / "cat_b" / "two.md").write_text("# Doc two\ncontent B")
    df = load_markdown_corpus(spark, str(tmp_path))
    rows = {r["document_id"]: r for r in df.collect()}
    assert set(rows) == {"cat_a/one.md", "cat_b/two.md"}
    r = rows["cat_a/one.md"]
    assert r["document_name"] == "one.md"
    assert r["document_category"] == "cat_a"
    assert r["document_text"] == "# Doc one\ncontent A"


def test_response_cache_roundtrip(spark, tmp_path):
    path = os.path.join(str(tmp_path), "cache_csv")
    cache = ResponseCache(spark, path)
    assert cache.load().count() == 0  # missing file -> empty, not error
    cache.add("what is pricing?", "resp1", reasoning="r1")
    cache.add("how to integrate?", "resp2")
    cache.add("what is pricing?", "resp1-updated")  # upsert semantics
    loaded = {r["Message"]: r["Response"] for r in cache.load().collect()}
    assert loaded == {"what is pricing?": "resp1-updated", "how to integrate?": "resp2"}

    msgs = spark.createDataFrame([("what is pricing?",), ("novel question",)], ["message"])
    hit = cache.lookup_join(msgs)
    got = {r["message"]: r["Response"] for r in hit.collect()}
    assert got["what is pricing?"] == "resp1-updated"
    assert got["novel question"] is None

    qs = [r["question"] for r in cache.sorted_questions().collect()]
    assert qs == sorted(qs)
