"""Driver-contract shape of __spark_entry__: the gate the driver actually
calls. Cheap insurance that a refactor never breaks the entry surface."""

from __future__ import annotations

import sys


def test_entry_contract_shape():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 54
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    assert len(oracles) >= 50
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(v, str) and v.strip() for v in oracles.values())
    # the rows-only entries are a deliberate, named set — additions to it
    # should be conscious decisions, not accidents
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "rag_pipeline",
        "rag_pipeline_bulk",
        "multimodal_features",
        "ddl_reference_pipeline",
    }, rows_only
