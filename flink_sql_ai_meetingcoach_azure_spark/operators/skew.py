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
