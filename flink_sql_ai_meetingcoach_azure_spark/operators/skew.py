"""Skew-mitigation operators for cluster-scale joins/aggregations.

At 100 TB, a handful of hot keys (one viral document, one dominant
customer) concentrate a shuffle partition onto one executor. Spark-side
remedies, in preference order:

1. **Broadcast** the small side — no shuffle at all (used by default in
   this engine's dim joins and vector search).
2. **AQE skew-join splitting** (`spark.sql.adaptive.skewJoin.enabled`,
   on in session.py) — handles sort-merge joins at runtime.
3. **Salting** (this module) — for the cases AQE can't fix: huge-×-medium
   joins where the medium side is too big to broadcast but small enough to
   replicate ``n_salts`` ways, and hot-key aggregations with non-algebraic
   state.

``salted_join`` replicates the small side once per salt value and spreads
the big side's hot keys uniformly across salts, so each (key, salt) bucket
is ~1/n_salts of the original hot partition. Equality with the plain join
is exact (tested) — salting changes partitioning, never semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on equi-key(s) with ``n_salts``-way salting.

    The big side gets a uniform pseudorandom salt derived from a stable
    row hash (deterministic across retries — no ``rand()``, which would
    break task-retry idempotence); the small side is exploded once per
    salt value. Join key becomes (keys..., salt).
    """
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()),
               F.lit(n_salts)).cast("int"),
    )
    small_salted = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_salted, on=keys + [_SALT], how=how).drop(_SALT)


def salted_count_by_key(
    df: DataFrame, keys: str | list[str], n_salts: int = 8
) -> DataFrame:
    """Two-phase hot-key count: groupBy(keys+salt) partials, then merge.

    Spark's hash aggregate already does map-side partial aggregation, which
    makes plain ``groupBy.count`` skew-resilient for algebraic aggregates —
    this exists for the patterns where partials don't combine (e.g. exact
    distinct counting downstream) and as the documented template.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*ks, _SALT).agg(F.count("*").alias("__partial"))
    return partial.groupBy(*ks).agg(F.sum("__partial").alias("n"))


def skew_profile(
    df: DataFrame,
    key: str,
    top_n: int = 20,
    partitions: int = 32,
) -> DataFrame:
    """Key-distribution diagnostic: the pre-pass before choosing a join
    strategy for a 100 TB shuffle.

    For the ``top_n`` heaviest keys (count desc, key asc — deterministic)
    emits exact integer diagnostics:

    - ``cnt`` — exact key frequency (map-side-combinable count; the
      vocabulary shuffle carries one row per distinct key, the profile's
      only full exchange);
    - ``share_ppm`` — cnt·10^6 div n, the key's share of all rows;
    - ``skew_x`` — cnt·n_keys div n: how many times the mean key weight
      this key carries (1 = uniform);
    - ``salt_n`` — ceil(cnt·partitions / n) in integer arithmetic: the
      salt fan-out at which this key's heaviest (key, salt) bucket drops
      to ~one partition's fair share — feed it to :func:`salted_join`.

    All arithmetic is integer (div / manual ceil), so the DuckDB oracle
    reproduces it bit-for-bit.
    """
    counts = df.groupBy(F.col(key).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("n_keys")
    )
    ranked = (
        counts.crossJoin(F.broadcast(totals))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_n)
    )
    return ranked.select(
        "key",
        "cnt",
        F.expr("CAST(cnt * 1000000 AS BIGINT) div n").alias("share_ppm"),
        F.expr("CAST(cnt * n_keys AS BIGINT) div n").alias("skew_x"),
        F.expr(f"CAST((cnt * {partitions} + n - 1) div n AS INT)").alias("salt_n"),
    )


def join_blowup_profile(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 20,
) -> DataFrame:
    """Exact join-output cardinality forecast: what an equi-join on
    ``key`` WILL produce, computed without producing it — the other
    pre-pass (next to :func:`skew_profile`) a 100 TB join plan starts
    with, since ``|A ⋈ B| = Σ_k cA(k)·cB(k)`` needs only the per-key
    count vectors, never the joined rows.

    For the ``top_n`` heaviest keys (out_rows desc, key asc) emits
    ``n_left``/``n_right`` (the per-side match counts), ``out_rows``
    (their product — this key's contribution to the join output),
    ``share_ppm`` (out_rows·10^6 div total, integer-exact), and
    ``total_out`` (the full join's output cardinality, rides every row
    for one-pass readability). A handful of keys owning most of
    ``total_out`` is the blowup signature: salt those keys
    (:func:`salted_join`) or rethink the join before paying its shuffle.

    Scale shape: two map-side-combinable per-key counts, one
    vocabulary-sized equi-join of the count relations (distinct keys,
    never the fact rows), a 1-row broadcast total, and a
    TakeOrderedAndProject top-k. Cost is two count-shuffles regardless
    of join output size — the entire point."""
    lc = left.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    per = lc.join(rc, "key").select(
        "key",
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("out_rows"),
    )
    tot = per.agg(F.sum("out_rows").alias("total_out"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n_left",
            "n_right",
            "out_rows",
            F.expr("CAST(out_rows * 1000000 AS BIGINT) div total_out").alias(
                "share_ppm"
            ),
            "total_out",
        )
        .orderBy(F.desc("out_rows"), F.asc("key"))
        .limit(top_n)
    )
