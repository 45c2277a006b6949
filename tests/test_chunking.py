"""Chunker semantics (reference F7: ML_CHARACTER_TEXT_SPLITTER with
8 positional params — terraform/generate_personalized_commands.sh:322-327)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.functions.chunking import (
    chunk_text,
    chunk_text_udf,
    fixed_stride_chunks_col,
)


def test_short_text_single_chunk():
    assert chunk_text("hello world") == ["hello world"]


def test_empty_and_none():
    assert chunk_text(None) == []
    assert chunk_text("") == []


def test_separator_split_keep_start():
    text = "part one###part two###part three"
    chunks = chunk_text(text, chunk_size=12, chunk_overlap=0, separator="###")
    # separator kept at START of following split
    joined = "".join(chunks)
    assert joined == text
    assert any(c.startswith("###") for c in chunks[1:])


def test_long_text_respects_chunk_size():
    text = "x" * 1000
    chunks = chunk_text(text, chunk_size=200, chunk_overlap=20)
    assert all(len(c) <= 200 for c in chunks)
    # overlap: consecutive chunks share a 20-char tail/head
    for a, b in zip(chunks, chunks[1:]):
        assert a[-20:] == b[:20]


def test_overlap_must_be_smaller():
    with pytest.raises(ValueError):
        chunk_text("abc", chunk_size=10, chunk_overlap=10)


def test_trim_drops_whitespace_chunks():
    chunks = chunk_text("  a  ###   ", chunk_size=5, chunk_overlap=0,
                        separator="###", trim=True)
    assert all(c == c.strip() and c for c in chunks)


def test_coverage_no_content_lost():
    text = "The quick brown fox. ### Jumped over the lazy dog. ### Done."
    chunks = chunk_text(text, chunk_size=30, chunk_overlap=0, separator="###")
    assert "".join(chunks) == text


def test_udf_matches_python(spark):
    texts = ["a" * 500, "one###two###three", "", "short"]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    rows = df.select(chunk_text_udf(chunk_size=100, chunk_overlap=10)(F.col("t")).alias("c")).collect()
    for t, r in zip(texts, rows):
        assert r["c"] == chunk_text(t, chunk_size=100, chunk_overlap=10)


def test_fixed_stride_pure_sql(spark):
    df = spark.createDataFrame([("abcdefghij",)], ["t"])
    out = df.select(fixed_stride_chunks_col("t", 4, 1).alias("c")).head()["c"]
    # stride 3, windows of 4: abcd, defg, ghij, j
    assert out == ["abcd", "defg", "ghij", "j"]
