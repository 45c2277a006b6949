"""Deterministic sampling / splitting for training-data curation.

Beyond-reference training-data operators (task mandate alongside the dedup
family): every large-scale pipeline needs to cut corpora into train/val
splits, downsample dominant strata, and fix a global example order. At
100 TB these must be:

- **a narrow map** — no shuffle, no count job, no driver round-trip;
- **retry-stable** — a task retry or speculative duplicate must select the
  SAME rows. ``rand()``-based sampling silently violates exactly-once
  under retries; hash-of-key sampling cannot;
- **engine-reproducible** — the md5-derived buckets match bit-for-bit in
  the DuckDB oracle (functions/hashing.py contract), so the sampled SETS
  are assertable, not just their sizes.

All operators key on a stable id column and salt the hash, so different
decisions (sample vs split) are independent and re-salting redraws.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.functions.hashing import (
    md5_bigint_col,
    md5_bigint_sql,
)

#: hash-bucket resolution: rates are quantized to 1/10000
N_BUCKETS = 10_000


def hash_bucket_col(key: Column | str, salt: str) -> Column:
    """Uniform bucket in [0, N_BUCKETS) from a 60-bit md5 hash of the key."""
    c = F.col(key) if isinstance(key, str) else key
    return md5_bigint_col(c.cast("string"), salt) % N_BUCKETS


def hash_bucket_sql(key_expr: str, salt: str) -> str:
    """DuckDB rendering of :func:`hash_bucket_col` (oracle parity)."""
    return f"{md5_bigint_sql(f'CAST({key_expr} AS VARCHAR)', salt)} % {N_BUCKETS}"


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ≈``fraction`` of rows by hash bucket — a pure filter that stays
    inside the scan's WholeStageCodegen (narrow; no shuffle, no count job,
    composes with any downstream op)."""
    return df.filter(hash_bucket_col(key_col, salt) < int(round(fraction * N_BUCKETS)))


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by hash range — disjoint,
    exhaustive, stable under any partitioning/retry (the classical
    train/val/test cut)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    b = hash_bucket_col(key_col, salt)
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        edge = int(round(acc * N_BUCKETS))
        expr = (
            F.when(b < edge, name) if expr is None else expr.when(b < edge, name)
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic rate (downsample a dominant language /
    source while keeping the tail intact). Still a pure filter: the
    per-row threshold is a CASE on the stratum, compared to the hash
    bucket — no shuffle, no per-stratum count pass."""
    thr: Column = F.lit(int(round(default_fraction * N_BUCKETS)))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, int(round(frac * N_BUCKETS))
        ).otherwise(thr)
    return df.filter(hash_bucket_col(key_col, salt) < thr)


def shuffle_by_hash(df: DataFrame, key_col: str, salt: str = "shuffle") -> DataFrame:
    """Global deterministic example shuffle (pre-training order
    randomization): total order by (hash, key). One range-partitioned sort
    — the unavoidable cost of a global order — but reproducible across
    runs, engines and retries, unlike ``orderBy(rand())``."""
    return df.orderBy(md5_bigint_col(F.col(key_col).cast("string"), salt), key_col)


def mixture_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    scale: float = 2.0,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-style domain rebalancing: cap every domain at
    ``ceil(scale * sqrt(n_domain))`` rows, selected deterministically by
    salted-md5 rank. Sqrt-scaling keeps tail domains intact while
    flattening dominant ones — the standard pre-training mixture shape
    (GPT-3/Pile-style sqrt temperature) without a normalization pass.

    Determinism: the quota is ``ceil`` of ``scale * sqrt(bigint)`` —
    IEEE-754 sqrt is correctly rounded in every engine, so quotas match
    exactly; selection ranks by the md5-bucket contract (retry-stable,
    engine-reproducible). Plan: one count aggregate per domain (tiny,
    broadcast back) + one window partitioned by domain. At extreme skew
    (one domain ≫ executor memory), pre-thin that domain with
    :func:`deterministic_sample` at rate ≈ quota/n first — the hash
    ranking makes the two-stage selection identical to the one-stage one
    on the surviving rows.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    quota = counts.select(
        domain_col,
        F.ceil(F.lit(scale) * F.sqrt(F.col("_n"))).cast("bigint").alias("_quota"),
    )
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(domain_col).orderBy(
        md5_bigint_col(F.col(key_col).cast("string"), salt), F.col(key_col)
    )
    return (
        df.join(F.broadcast(quota), domain_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def score_tiered_sample(
    df: DataFrame,
    key_col: str,
    score_col: str,
    rates: tuple[float, ...] = (1.0, 0.5, 0.1),
    salt: str = "tier",
    tier_col: str = "tier",
) -> DataFrame:
    """CCNet-style tiered resampling: rank rows into ``len(rates)`` equal
    CDF tiers of an INTEGER score (tier 0 = best) and admit each tier at
    its rate by deterministic hash bucket — the head/middle/tail
    perplexity resampling of CCNet (Wenzek et al. 2020) without a single
    random draw.

    Tier assignment is per DISTINCT SCORE VALUE (a score group never
    straddles tiers): group g with inclusive cumulative count ``cum`` in
    best-first order lands in the first tier i with
    ``k·cum <= (i+1)·total`` — pure integer arithmetic, so two engines
    cannot disagree on a boundary. The cumulative pass runs DRIVER-side
    over the collected score HISTOGRAM (domain-sized metadata, same
    discipline as IVF centroid collection — guarded by ``max_domain``,
    and explicitly NOT a single-partition window over corpus rows); the
    corpus itself is touched by one combinable groupBy, one
    broadcast-sized join back, and a codegen filter.

    For a score with corpus-sized cardinality, quantize first (e.g.
    ``div(score, 1000)``) so the domain stays collectable — tier
    boundaries move by at most one quantization step.
    """
    k = len(rates)
    max_domain = 1_000_000
    # the input feeds TWO consumers (the histogram collect and the final
    # tier join) and its lineage may be an expensive upstream chain —
    # materialize once (lsh_candidate_pairs discipline; blocks released
    # by the ContextCleaner with the plan)
    df = df.localCheckpoint(eager=False)
    hist = (
        df.groupBy(score_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .limit(max_domain + 1)
        .collect()
    )
    if len(hist) > max_domain:
        raise ValueError(
            f"score domain exceeds {max_domain} distinct values — quantize "
            f"the score first (e.g. div({score_col}, 1000)) so the tier "
            "histogram stays driver-collectable"
        )
    hist.sort(key=lambda r: r[0], reverse=True)  # best-first
    total = sum(r["__c"] for r in hist)
    rows, cum = [], 0
    for r in hist:
        cum += r["__c"]
        tier = next(
            (i for i in range(k - 1) if k * cum <= (i + 1) * total), k - 1
        )
        rows.append((r[0], tier))
    spark = df.sparkSession
    # explicit schema: an EMPTY histogram (empty input) cannot infer one
    import pyspark.sql.types as T  # noqa: PLC0415

    tier_schema = T.StructType(
        [df.schema[score_col], T.StructField(tier_col, T.IntegerType())]
    )
    tiers = spark.createDataFrame(rows, tier_schema)
    labeled = df.join(F.broadcast(tiers), score_col)
    thresh = None
    for i, r in enumerate(rates):
        edge = F.lit(int(round(r * N_BUCKETS)))
        thresh = (
            F.when(F.col(tier_col) == i, edge)
            if thresh is None
            else thresh.when(F.col(tier_col) == i, edge)
        )
    return labeled.filter(hash_bucket_col(key_col, salt) < thresh)


WSAMPLE_SPACE = 1 << 30  # 30-bit uniform: keeps every product below 2^63


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    max_weight: int,
    rate_at_max: float = 1.0,
    salt: str = "wsample",
) -> Column | DataFrame:
    """Weight-proportional Bernoulli sampling with ZERO floats and zero
    rand(): each row is admitted iff ``u * max_weight < w * thr`` where
    ``u`` is a 30-bit md5 uniform of the key and ``thr =
    round(rate_at_max * 2^30)`` — P(admit) = rate_at_max · w/max_weight,
    exact integer comparison on both engines, stable under any
    partitioning/retry (`rand()` sampling is not, under task retries).
    Continuous-weight companion to the tiered/mixture samplers; a pure
    codegen filter, no shuffle, no count job."""
    u = md5_bigint_col(F.col(key_col).cast("string"), salt) % F.lit(WSAMPLE_SPACE)
    thr = int(round(rate_at_max * WSAMPLE_SPACE))
    w = F.least(F.col(weight_col).cast("long"), F.lit(max_weight))
    return df.filter(u * F.lit(max_weight) < w * F.lit(thr))


def weighted_sample_sql(
    key_expr: str,
    weight_expr: str,
    max_weight: int,
    rate_at_max: float = 1.0,
    salt: str = "wsample",
) -> str:
    """DuckDB predicate identical to :func:`weighted_sample`."""
    thr = int(round(rate_at_max * WSAMPLE_SPACE))
    u = f"({md5_bigint_sql(f'CAST({key_expr} AS VARCHAR)', salt)} % {WSAMPLE_SPACE})"
    w = f"least(CAST({weight_expr} AS BIGINT), {max_weight})"
    return f"{u} * {max_weight} < {w} * {thr}"
