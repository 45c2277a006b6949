"""Whole-registry physical-plan hygiene sweep.

Every `queries()` entry is planned (not executed) at sf0.001 and its
executed-plan string is screened for the three anti-patterns that kill
100 TB runs:

- **CartesianProduct** — a non-broadcast cross join; the repo's scalar
  crossJoins must all stay BroadcastNestedLoopJoin over 1-row sides,
  which is what this distinguishes.
- **BatchEvalPython** — a row-at-a-time Python UDF in the plan; only
  the reference-semantics text chunker (`functions/chunking.py`, UDF
  feeding explode — kept per-row deliberately for byte-parity with the
  reference splitter) is allowed, via the explicit allowlist below.
- **Unpartitioned Window** — `Window [...], []` with an empty
  partition spec serializes the whole relation through one task; the
  scale-safe alternative is `operators/indexing.global_row_number`'s
  range-exchange + prefix-sum, and no entry may regress to the single-
  partition form.

This is the automated form of the per-round anti-pattern audit: adding
an entry with a quadratic join, a hot-path Python UDF, or a global
window fails CI here, not in a 1000-executor postmortem.
"""

from __future__ import annotations

import re

from flink_sql_ai_meetingcoach_azure_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# BatchEvalPython allowed ONLY where the reference-parity chunker UDF
# is the documented plan (VERDICT r6 anti-pattern scan: "the only F.udf
# is the reference-semantics text chunker feeding explode").
CHUNKER_UDF_ENTRIES = {
    "rag_pipeline_verified",
    "chunk_embed_ingest",
    "rag_retrieval",
    "ddl_reference_pipeline",
}

_UNPARTITIONED_WINDOW = re.compile(r"Window \[[^\]]*\], \[\]")


def test_every_entry_plans_clean(spark):
    failures = []
    for name, spec in QUERIES.items():
        df = spec.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct (non-broadcast cross join)")
        if "BatchEvalPython" in plan and name not in CHUNKER_UDF_ENTRIES:
            failures.append(f"{name}: BatchEvalPython outside the chunker allowlist")
        if _UNPARTITIONED_WINDOW.search(plan):
            failures.append(f"{name}: unpartitioned Window (single-task sort)")
    assert not failures, "\n".join(failures)


def test_chunker_allowlist_entries_still_exist():
    """The allowlist must shrink when entries are renamed/removed —
    stale names would silently widen the permitted surface."""
    assert CHUNKER_UDF_ENTRIES <= set(QUERIES)
