"""Driver-contract shape of __spark_entry__: the gate the driver actually
calls. Cheap insurance that a refactor never breaks the entry surface."""

from __future__ import annotations

import sys


def test_entry_contract_shape():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 56
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    assert len(oracles) >= 54
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(v, str) and v.strip() for v in oracles.values())
    # the rows-only entries are a deliberate, named set — additions to it
    # should be conscious decisions, not accidents
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "rag_pipeline",
        "ddl_reference_pipeline",
    }, rows_only
    # the driver checks the FIRST 50 entries; the tail is the deliberate
    # out-of-window set (rows-only chains, oracle-backed entries subsumed
    # by an in-window hash-checked superset, and post-window-fix additions
    # — see queries.QUERIES)
    assert list(qs)[50:] == [
        "rag_retrieval",
        "multimodal_meta",
        "rag_pipeline",
        "ddl_reference_pipeline",
        "pii_redact",
        "pack_sequences",
    ]
    assert all(oracles.get(n) for n in list(qs)[:50])  # window is 100% oracle-backed
