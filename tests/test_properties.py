"""Property-based tests (hypothesis) for the pure-Python kernels: chunker
coverage invariants and Avro codec roundtrips. These run without Spark."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_sql_ai_meetingcoach_azure_spark.functions.chunking import chunk_text
from flink_sql_ai_meetingcoach_azure_spark.models.providers import mock_embedding
from flink_sql_ai_meetingcoach_azure_spark.sources.avro_codec import (
    decode_record,
    encode_record,
)

TEXT = st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=600)


@settings(max_examples=60, deadline=None)
@given(TEXT, st.integers(20, 200), st.integers(0, 19))
def test_chunk_size_bound(text, size, overlap):
    for c in chunk_text(text, chunk_size=size, chunk_overlap=overlap, separator="###"):
        assert 0 < len(c) <= size


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_chunk_no_separator_lossless(text):
    """Without separators in the text and zero overlap, chunks concatenate
    back to the input (nothing lost, nothing duplicated)."""
    chunks = chunk_text(text, chunk_size=50, chunk_overlap=0, separator="###")
    if "###" not in text:
        assert "".join(chunks) == text


@settings(max_examples=40, deadline=None)
@given(TEXT)
def test_mock_embedding_unit_norm(text):
    v = mock_embedding(text, dim=32)
    assert len(v) == 32
    assert abs(sum(x * x for x in v) - 1.0) < 1e-6


AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "n", "type": "long"},
        {"name": "f", "type": {"type": "array", "items": "double"}},
        {"name": "b", "type": "boolean"},
    ],
}


@settings(max_examples=80, deadline=None)
@given(
    st.one_of(st.none(), st.text(max_size=100)),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.lists(st.floats(allow_nan=False, allow_infinity=False, width=64), max_size=8),
    st.booleans(),
)
def test_avro_roundtrip_property(s, n, f, b):
    rec = {"s": s, "n": n, "f": f, "b": b}
    assert decode_record(AVRO_SCHEMA, encode_record(AVRO_SCHEMA, rec)) == rec


@settings(max_examples=120, deadline=None)
@given(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
    st.sampled_from(["sample", "split", "strat"]),
)
def test_hash_bucket_duckdb_matches_python(key, salt):
    """The sampling operators' cross-engine contract: DuckDB's rendering of
    the md5 bucket equals the plain-Python reference for arbitrary unicode
    keys (the Spark side is pinned by the 40+ hash-green oracle entries
    built on the same conv(substr(md5)) formula)."""
    import hashlib

    import duckdb

    from flink_sql_ai_meetingcoach_azure_spark.operators.sampling import (
        N_BUCKETS,
        hash_bucket_sql,
    )

    expected = (
        int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:15], 16) % N_BUCKETS
    )
    got = duckdb.execute(
        f"SELECT {hash_bucket_sql('?', salt)}", [key]
    ).fetchone()[0]
    assert got == expected


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=900))
def test_closed_form_chunker_matches_chunk_text(text):
    """Guards the SQL oracles of chunk_embed_ingest / rag_retrieval: for
    any text WITHOUT the separator, chunk_text collapses to the closed
    form the DuckDB SQL implements (stride windows + the tail-merge case).
    If chunk_text's merge logic ever changes, this fails before the
    correctness gate does."""
    if "###" in text or not text:
        return
    size, ov = 200, 20
    stride = size - ov
    starts = list(range(0, max(len(text) - ov, 1), stride))
    n = len(starts)
    closed = []
    for i, s in enumerate(starts):
        tail_len = len(text) - s
        if i == n - 1 and n > 1 and tail_len <= stride:
            closed.append(text[s : s + ov] + text[s : s + tail_len])
        else:
            closed.append(text[s : s + size])
    assert closed == chunk_text(text, size, ov, "###", False, False, True, "START")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("abcdefgh XY.,!"), min_size=0, max_size=120
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_span_hash_duckdb_matches_python(texts, window):
    """Cross-engine contract of the span-dedup Horner hashing: the DuckDB
    CTE rendering produces exactly the (doc_id, pos, h) postings a plain
    Python reference computes — per-token 32-bit md5, two polynomial
    channels, trailing windows dropped, short docs empty.  (The Spark side
    is pinned by the hash-green dup_spans/span_pairs oracle entries built
    on the same CTEs.)"""
    import hashlib
    import re as _re

    import duckdb

    from flink_sql_ai_meetingcoach_azure_spark.operators.spans import (
        SPAN_HASH_B,
        SPAN_HASH_P,
    )
    from flink_sql_ai_meetingcoach_azure_spark.queries import (
        _sql_span_postings_ctes,
    )

    def py_spans(doc_id, text):
        toks = [t for t in _re.split(r"\s+", text.lower()) if t]
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        out = []
        for i in range(len(toks) - window + 1):
            chans = []
            for b, p in zip(SPAN_HASH_B, SPAN_HASH_P):
                acc = hs[i]
                for j in range(1, window):
                    acc = (acc * b + hs[i + j]) % p
                chans.append(acc)
            out.append((doc_id, i, f"{chans[0]}_{chans[1]}"))
        return out

    expected = sorted(
        row for d, t in enumerate(texts) for row in py_spans(d, t)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {_sql_span_postings_ctes(window)} "
            "SELECT doc_id, pos, h FROM spans"
        ).fetchall()
    )
    assert got == expected
