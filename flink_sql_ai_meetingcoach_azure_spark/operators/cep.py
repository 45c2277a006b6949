"""Event-sequence (CEP-lite) pattern matching over keyed event streams.

Flink SQL's headline CEP surface is ``MATCH_RECOGNIZE``; the reference
pipeline itself never uses it, but sequence/funnel analysis is the standard
event-analytics companion to its windowed aggregations, so this operator
provides the deterministic core: anchored greedy first-match of an ordered
event-type pattern per key, with an optional end-to-end time bound
(``A then B then C within N seconds``).

Semantics (documented, deterministic):

- Only events whose type appears in the pattern participate (the ``isin``
  filter pushes into the scan).
- Events are processed in ``(ts, id)`` order per key; the match anchors at
  the FIRST stage-1 event and each later stage advances at the first
  following event of the next stage's type (greedy = chained minima).
- ``within_seconds`` bounds ``end - start`` of the COMPLETED match; partial
  progress is reported via ``stages_hit`` either way.

Scale shape: one ``groupBy(key)`` shuffle carrying only pattern-type events
(filtered at the scan); the per-key step-through is a single codegen'd
``aggregate`` lambda over the sorted event array — no Python, no window
exchange, no self-joins (a k-stage funnel as chained joins would be k
shuffles). Per-key state is the pattern-type event list; for keys with
unbounded event counts pre-thin with a time predicate the same way the
reference bounds its topics by retention.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def match_funnel(
    df: DataFrame,
    pattern: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str | None = None,
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-key anchored greedy funnel match of ``pattern``.

    Returns one row per key that has at least one pattern-type event:
    ``(user_col, stages_hit, matched, start_ts, end_ts)`` where
    ``stages_hit`` counts greedy progress through the pattern,
    ``start_ts`` is the anchor (first stage-1 event, null when
    ``stages_hit`` = 0), ``end_ts`` the completing event's time (null
    unless the full pattern matched), and ``matched`` additionally applies
    the ``within_seconds`` bound.
    """
    if not pattern:
        raise ValueError("pattern must name at least one event type")
    pat = F.array(*[F.lit(p) for p in pattern])
    evs = df.filter(F.col(type_col).isin(list(pattern)))
    order_fields = [F.col(ts_col).alias("ts")]
    if id_col is not None:
        order_fields.append(F.col(id_col).alias("eid"))
    order_fields.append(F.col(type_col).alias("tp"))
    per_user = evs.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct(*order_fields))).alias("__evs")
    )

    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("t0"),
        F.lit(None).cast("timestamp").alias("tlast"),
    )

    def step(s: Column, e: Column) -> Column:
        advance = F.struct(
            (s["stage"] + 1).alias("stage"),
            F.coalesce(s["t0"], e["ts"]).alias("t0"),
            e["ts"].alias("tlast"),
        )
        # F.get is 0-indexed and yields NULL (→ condition false) once the
        # pattern is exhausted — element_at would raise under ANSI mode
        return F.when(e["tp"] == F.get(pat, s["stage"]), advance).otherwise(s)

    state = F.aggregate("__evs", init, step)
    full = state["stage"] == len(pattern)
    matched = full
    if within_seconds is not None:
        matched = full & (
            F.unix_micros(state["tlast"]) - F.unix_micros(state["t0"])
            <= int(within_seconds) * 1_000_000
        )
    return per_user.select(
        user_col,
        state["stage"].cast("int").alias("stages_hit"),
        matched.alias("matched"),
        state["t0"].alias("start_ts"),
        F.when(full, state["tlast"]).alias("end_ts"),
    )


def match_funnel_stream(
    stream: DataFrame,
    pattern: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str | None = None,
    within_seconds: int | None = None,
) -> DataFrame:
    """Streaming :func:`match_funnel`: the same anchored greedy semantics
    maintained per key across micro-batches in ``applyInPandasWithState``
    GroupState — CEP the way Flink's MATCH_RECOGNIZE actually runs,
    continuously. State is three scalars per key (stage, anchor µs, last
    µs) — bounded, checkpointed, restored on restart. Emits one snapshot
    row per key per micro-batch that touched it (update semantics); because
    greedy progress is prefix-stable, feeding N batches ends in exactly the
    state the batch operator computes over their union (asserted in
    tests/test_streaming.py)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    if not pattern:
        raise ValueError("pattern must name at least one event type")
    pat = list(pattern)
    evs = stream.filter(F.col(type_col).isin(pat))
    sort_cols = [ts_col] + ([id_col] if id_col is not None else [])
    key_type = stream.schema[user_col].dataType.simpleString()

    def fn(key, pdfs, state):
        (user,) = key
        stage, t0us, tlus = state.get if state.exists else (0, None, None)
        whole = pd.concat(list(pdfs), ignore_index=True)
        if len(whole):
            # Arrow chunk order is not event order — sort the whole group
            whole = whole.sort_values(sort_cols, kind="mergesort")
        for _, row in whole.iterrows():
            if stage < len(pat) and row[type_col] == pat[stage]:
                ts_us = int(pd.Timestamp(row[ts_col]).value // 1000)
                if stage == 0:
                    t0us = ts_us
                tlus = ts_us
                stage += 1
        state.update((stage, t0us, tlus))
        full = stage == len(pat)
        matched = bool(
            full
            and (
                within_seconds is None
                or (tlus - t0us) <= int(within_seconds) * 1_000_000
            )
        )
        yield pd.DataFrame(
            [
                {
                    user_col: user,
                    "stages_hit": stage,
                    "matched": matched,
                    "start_ts": pd.Timestamp(t0us, unit="us") if stage >= 1 else pd.NaT,
                    "end_ts": pd.Timestamp(tlus, unit="us") if full else pd.NaT,
                }
            ]
        )

    return evs.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{user_col} {key_type}, stages_hit int, matched boolean, "
            "start_ts timestamp, end_ts timestamp"
        ),
        stateStructType="stage int, t0_us long, tl_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(
    stream: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming gap sessionization: the continuous form of the batch
    ``sessionize`` entry (queries.py) — every event is assigned its
    per-user session index as it arrives, maintained across micro-batches
    in ``applyInPandasWithState`` GroupState of TWO scalars per key
    (last event µs, current session seq). Emits one row per event
    (append semantics), so downstream feature joins consume assignments
    continuously instead of re-running the batch window.

    Contract: per-key event-time-ordered arrival across batches (the
    realistic ingest shape; the same monotone contract as the streaming
    near-dup sink) — within a batch any order is fine (sorted here).
    Under that contract N batches end in exactly the assignment the
    batch one-window formulation computes over their union (asserted in
    tests/test_streaming.py). For out-of-order cross-batch events use
    Spark's native watermarked ``session_window`` aggregate instead —
    that gives buffering but only aggregate outputs, not per-event ids.

    At scale: state is 16 bytes per ACTIVE user, the shuffle is one
    exchange keyed by user, and each batch's work is linear in its rows.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    gap_us = int(gap_seconds) * 1_000_000
    key_type = stream.schema[user_col].dataType.simpleString()
    id_type = stream.schema[id_col].dataType.simpleString()

    def fn(key, pdfs, state):
        (user,) = key
        last_us, seq = state.get if state.exists else (None, 0)
        whole = pd.concat(list(pdfs), ignore_index=True)
        if len(whole):
            whole = whole.sort_values([ts_col, id_col], kind="mergesort")
        out_ids, out_seqs = [], []
        for _, row in whole.iterrows():
            ts_us = int(pd.Timestamp(row[ts_col]).value // 1000)
            if last_us is not None and ts_us - last_us > gap_us:
                seq += 1
            last_us = ts_us
            out_ids.append(row[id_col])
            out_seqs.append(seq)
        state.update((last_us, seq))
        yield pd.DataFrame(
            {id_col: out_ids, user_col: user, "session_seq": out_seqs}
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{id_col} {id_type}, {user_col} {key_type}, session_seq long"
        ),
        stateStructType="last_us long, seq long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
