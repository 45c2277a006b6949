"""Text / prompt / JSON scalar functions (SURVEY.md §2.8).

Covers: prompt assembly (F1, reference:
terraform/generate_personalized_commands.sh:421-430), trigger-keyword
predicate (P5/F13, reference: app/utils/data_utils.py:20-46), LLM JSON
cleanup + parse (F14, reference: app/static/script.js:950-972), path
extraction (F15), used-excerpt join (F16).

Everything here is built-in-function compositions — JVM-side, codegen'd, no
Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.schemas import COACHING_RESPONSE

# reference: app/utils/data_utils.py:20-24 (15 keywords)
TRIGGER_KEYWORDS = [
    "price", "expensive", "cost", "competitor", "issue", "problem",
    "concern", "difficult", "challenge", "roi", "implementation",
    "integration", "budget", "techriva", "competex",
]


def keyword_trigger_col(message: Column | str, keywords: list[str] | None = None) -> Column:
    """``any(keyword in message.lower() for keyword in TRIGGER_KEYWORDS)``
    (reference: app/utils/data_utils.py:29-30) as a single JVM-side rlike."""
    c = F.col(message) if isinstance(message, str) else message
    kws = keywords if keywords is not None else TRIGGER_KEYWORDS
    # regex-escape each keyword: the contract is plain substring containment
    # (reference does `kw in message`), so metacharacters in caller-supplied
    # keywords must match literally
    import re  # noqa: PLC0415

    return F.lower(c).rlike("|".join(re.escape(k) for k in kws))


def assemble_coaching_prompt(
    message: Column | str, rag_results: Column | str, k: int = 3
) -> Column:
    """Build the LLM prompt from the prospect message + top-k RAG chunks.

    Mirrors the CONCAT in the reference's generation stage
    (generate_personalized_commands.sh:421-430), which interleaves
    ``Document i: <document_id>`` / ``<chunks>`` for the 3 results. Uses
    ``element_at`` (1-based, like Flink array subscripts — SURVEY §7.4.3).
    """
    msg = F.col(message) if isinstance(message, str) else message
    rr = F.col(rag_results) if isinstance(rag_results, str) else rag_results
    parts: list[Column] = [F.lit("## PROSPECT MESSAGE: "), msg, F.lit("\n\n## RAG DOCUMENTS:\n")]
    for i in range(1, k + 1):
        # try_element_at: 1-based like Flink's arr[i] (SURVEY §7.4.3), NULL
        # instead of error when fewer than k results came back
        el = F.try_element_at(rr, F.lit(i))
        parts += [
            F.lit(f"Document {i}: "),
            F.coalesce(el["document_id"], F.lit("")),
            F.lit("\n"),
            F.coalesce(el["chunks"], F.lit("")),
        ]
        if i < k:  # reference CONCAT (:421-430) has no trailing separator
            parts.append(F.lit("\n\n"))
    return F.concat(*parts)


def clean_llm_json_col(raw: Column | str) -> Column:
    """Strip ```json fences, trailing commas and stray newlines from an LLM
    JSON-ish response (reference: app/static/script.js:953-961)."""
    c = F.col(raw) if isinstance(raw, str) else raw
    c = F.regexp_replace(c, r"```(?:json)?", "")
    c = F.regexp_replace(c, r",\s*([}\]])", r"$1")
    return F.trim(c)


def parse_coaching_response(raw: Column | str) -> Column:
    """Cleanup + parse the coaching JSON into the typed struct
    (FIXTURES.md schema 8). Keep the raw column alongside — SURVEY §7.4.5."""
    return F.from_json(clean_llm_json_col(raw), COACHING_RESPONSE)


def doc_title_col(document_id: Column | str) -> Column:
    """Filename part of a slash-separated document_id (F15)."""
    c = F.col(document_id) if isinstance(document_id, str) else document_id
    return F.substring_index(c, "/", -1)


def doc_path_col(document_id: Column | str) -> Column:
    """Directory part of a slash-separated document_id (F15)."""
    c = F.col(document_id) if isinstance(document_id, str) else document_id
    parts = F.split(c, "/")
    return F.array_join(F.slice(parts, 1, F.greatest(F.size(parts) - 1, F.lit(0))), "/")


def used_excerpts_col(sources: Column | str) -> Column:
    """Join non-empty ``used_excerpt`` fields with blank lines
    (reference: app/static/script.js:970)."""
    c = F.col(sources) if isinstance(sources, str) else sources
    return F.array_join(
        F.transform(
            F.filter(c, lambda s: s["used_excerpt"].isNotNull() & (F.length(s["used_excerpt"]) > 0)),
            lambda s: s["used_excerpt"],
        ),
        "\n\n",
    )
