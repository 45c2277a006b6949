"""Driver-contract shape of __spark_entry__: the gate the driver actually
calls. Cheap insurance that a refactor never breaks the entry surface."""

from __future__ import annotations

import sys


def test_entry_contract_shape():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 70
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    assert len(oracles) >= 68
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(v, str) and v.strip() for v in oracles.values())
    # every registry entry is oracle-backed as of r11: the last rows-only
    # entry (rag_pipeline — nondeterministic limit() knowledge base) was
    # retired in favour of its hash-verified twins rag_pipeline_verified
    # and rag_pipeline_bulk (VERDICT r10 #8). Additions to the rows-only
    # set must be conscious decisions, not accidents.
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    # the driver checks the FIRST 50 entries; since r12 the window
    # membership lives in queries._WINDOW_R13 and is DERIVED from the
    # CORRECTNESS_r*.json ledger — the rotation rules are enforced
    # against the ledger itself in test_window_rotation_matches_ledger
    # below (VERDICT r11 #8: computed, not hand-claimed).
    assert all(oracles.get(n) for n in list(qs)[:50])  # window is 100% oracle-backed


def test_window_rotation_matches_ledger():
    """The r10 stale-claim bug class, made impossible (VERDICT r11 #8):
    every window/rotation claim is re-derived from the driver's own
    CORRECTNESS_r*.json records on each pytest run —
      1. the registry order actually starts with _WINDOW_R13;
      2. every never-externally-checked entry is IN the window (new
         work cannot re-open the external-evidence ledger);
      3. every out-of-window entry has external green evidence at or
         above the rotation floor (r13 rotated every r06-evidence
         entry into the window — the tail floor is r08);
      4. the window's stale-rotation slots really are the stalest: no
         tail entry's evidence is older than any rotated-in entry's
         evidence round."""
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    import __spark_entry__ as e
    from evidence_ledger import latest_evidence

    from flink_sql_ai_meetingcoach_azure_spark.queries import _WINDOW_R13

    qs = list(e.queries())
    window, tail = qs[:50], qs[50:]
    assert window == _WINDOW_R13
    led = latest_evidence()
    assert set(led) == set(qs)
    never = {n for n, r in led.items() if r is None}
    assert never <= set(window), never - set(window)
    TAIL_EVIDENCE_FLOOR = 8  # raise on each future rotation
    tail_rounds = {n: led[n] for n in tail}
    assert all(r is not None and r >= TAIL_EVIDENCE_FLOOR
               for r in tail_rounds.values()), {
        n: r for n, r in tail_rounds.items()
        if r is None or r < TAIL_EVIDENCE_FLOOR
    }


def test_out_of_window_oracles_stay_green(spark):
    """The driver never verifies entries past #50, so the subsumption claims
    for the out-of-window oracle-backed entries could silently drift — run
    the full gate (rows + schema + dtype drift + values vs DuckDB) for
    exactly those entries at sf0.001 on every pytest run (ADVICE r4)."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from tools.check_correctness import check_entries

    qs, oracles = e.queries(), e.oracle_sql()
    tail_oracle_backed = [n for n in list(qs)[50:] if n in oracles]
    assert tail_oracle_backed  # the set exists by construction
    failures = check_entries(spark, "/root/testdata/sf0.001", tail_oracle_backed)
    assert not failures, failures
