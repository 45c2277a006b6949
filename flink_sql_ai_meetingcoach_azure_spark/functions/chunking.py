"""Text chunking — Spark-side replacement for Flink's
``ML_CHARACTER_TEXT_SPLITTER(text, 200, 20, '###', false, false, true, 'START')``
(reference: terraform/generate_personalized_commands.sh:322-327).

Semantics implemented (LangChain-style CharacterTextSplitter):
split on ``separator`` (optionally regex), optionally keep the separator
attached to the START of the following split, then greedily merge splits into
chunks of at most ``chunk_size`` characters with ``chunk_overlap`` characters
of overlap carried between consecutive chunks. ``trim`` strips whitespace.

Two implementations are provided:

- :func:`chunk_text` / :func:`chunk_text_udf` — the full 8-parameter
  semantics as a Python function + Spark UDF (used with ``F.explode`` to
  reproduce the reference's ``CROSS JOIN UNNEST``).
- :func:`fixed_stride_chunks_col` — a pure-SQL fixed-stride windowed chunker
  (``sequence`` + ``substring``) that stays entirely JVM-side / codegen'd and
  is expressible in ANSI SQL for oracle checking. Use this at scale when the
  separator-aware behavior is not required.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_CHUNK_SIZE = 200  # reference: generate_personalized_commands.sh:324
DEFAULT_CHUNK_OVERLAP = 20
DEFAULT_SEPARATOR = "###"


def _split_keep_separator(
    text: str, separator: str, is_regex: bool, keep_separator: bool, position: str
) -> list[str]:
    sep_pat = separator if is_regex else re.escape(separator)
    if not separator:
        return [text]
    if not keep_separator:
        return [p for p in re.split(sep_pat, text)]
    # keep separator attached to the START (or END) of splits
    parts = re.split(f"({sep_pat})", text)
    out: list[str] = []
    if position.upper() == "START":
        buf = parts[0]
        i = 1
        while i < len(parts):
            if buf != "":
                out.append(buf)
            buf = parts[i] + (parts[i + 1] if i + 1 < len(parts) else "")
            i += 2
        if buf != "":
            out.append(buf)
    else:  # END
        buf = ""
        for i, p in enumerate(parts):
            buf += p
            if i % 2 == 1:  # separator piece -> close chunk
                out.append(buf)
                buf = ""
        if buf != "":
            out.append(buf)
    return out


def chunk_text(
    text: str | None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    separator: str = DEFAULT_SEPARATOR,
    is_regex: bool = False,
    trim: bool = False,
    keep_separator: bool = True,
    position: str = "START",
) -> list[str]:
    """Full ML_CHARACTER_TEXT_SPLITTER semantics (8 positional params in the
    reference's argument order)."""
    if text is None:
        return []
    if chunk_overlap >= chunk_size:
        raise ValueError("chunk_overlap must be < chunk_size")
    splits = _split_keep_separator(text, separator, is_regex, keep_separator, position)

    # Any split longer than chunk_size is hard-wrapped with overlap.
    pieces: list[str] = []
    stride = chunk_size - chunk_overlap
    for s in splits:
        if len(s) <= chunk_size:
            pieces.append(s)
        else:
            for start in range(0, max(len(s) - chunk_overlap, 1), stride):
                pieces.append(s[start : start + chunk_size])

    # Greedy merge of consecutive pieces up to chunk_size, carrying overlap.
    chunks: list[str] = []
    cur = ""
    for p in pieces:
        if cur and len(cur) + len(p) > chunk_size:
            chunks.append(cur)
            cur = cur[max(len(cur) - chunk_overlap, 0) :] if chunk_overlap else ""
            # avoid runaway when overlap tail + piece still exceeds size
            if len(cur) + len(p) > chunk_size:
                cur = ""
        cur += p
    if cur:
        chunks.append(cur)
    if trim:
        chunks = [c.strip() for c in chunks if c.strip()]
    return [c for c in chunks if c != ""]


def chunk_text_udf(
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    separator: str = DEFAULT_SEPARATOR,
    is_regex: bool = False,
    trim: bool = False,
    keep_separator: bool = True,
    position: str = "START",
):
    """Spark UDF: STRING -> ARRAY<STRING>. Compose with ``F.explode`` to get
    the reference's ``CROSS JOIN UNNEST(ML_CHARACTER_TEXT_SPLITTER(...))``."""

    # no type hints: F.udf would try (and fail) to infer an eval type from
    # them, emitting a UserWarning per registration
    def _f(text):
        return chunk_text(
            text, chunk_size, chunk_overlap, separator, is_regex, trim, keep_separator, position
        )

    return F.udf(_f, T.ArrayType(T.StringType()))


def fixed_stride_chunks_col(
    text: Column | str, chunk_size: int = DEFAULT_CHUNK_SIZE, chunk_overlap: int = DEFAULT_CHUNK_OVERLAP
) -> Column:
    """Pure-SQL chunker: ARRAY<STRING> of ``substring`` windows of length
    ``chunk_size`` starting every ``chunk_size - chunk_overlap`` chars.

    Stays JVM-side (no Python worker) — the scale path for bulk corpus
    chunking. ANSI-SQL equivalent (DuckDB oracle)::

        list_transform(generate_series(1, greatest(len(t),1), stride),
                       s -> substr(t, s, chunk_size))
    """
    c = F.col(text) if isinstance(text, str) else text
    stride = chunk_size - chunk_overlap
    starts = F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1)), F.lit(stride))
    return F.transform(starts, lambda s: F.substring(c, s, chunk_size))
