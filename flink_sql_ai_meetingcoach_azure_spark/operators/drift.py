"""Distribution-drift statistics computed from combinable count state.

The exact-integer two-sample Kolmogorov–Smirnov statistic lives here as
ONE implementation over a (value, half, count) table so the batch query
(queries.q_ks_drift) and the continuous readout
(streaming.aggregate_sink.ks_drift_readout) cannot drift apart — the
same single-source discipline as operators.text_search.
vocab_coverage_curve (ADVICE r10).

Scale design: the input is a per-(value, half) COUNT table — combinable,
mergeable, and value-bounded (distinct metric values, not rows), so the
cumulative window and argmax below run over the value vocabulary however
large the underlying corpus or stream history is. That is exactly the
state a streaming rollup sink already maintains, which is what makes the
continuous form free: the KS derivation never touches raw events.

Reference anchor: the reference pipeline monitors its conversation
stream only by eyeballing dashboards (app/routes, no statistical
monitor); this is the beyond-reference drift family's shared core
(SURVEY §2 extension: ks_drift / event_rate_anomaly / cusum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cusum_from_counts", "ks_from_counts"]


def ks_from_counts(
    counts: DataFrame,
    v_col: str = "v",
    half_col: str = "half",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Exact-integer two-sample KS from a (value, half∈{0,1}, count)
    table: max|F_a(x) − F_b(x)| in ppm by cross-multiplication
    (|cum_a·n_b − cum_b·n_a|·1e6 div (n_a·n_b) — no float CDFs), one
    combinable pivot, one cumulative window over the DISTINCT-VALUE
    table, one argmax with the smallest-value tie pin. Also reports the
    classic α=0.01 threshold scaled the same way
    (1.628·sqrt((n_a+n_b)/(n_a·n_b)), the only float, rounded once) and
    the reject flag. Output: one row
    (n_a, n_b, ks_at_value, ks_ppm, crit_ppm_a01, reject)."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    c = counts.groupBy(F.col(v_col).alias("v")).agg(
        F.sum(
            F.when(F.col(half_col) == 0, F.col(cnt_col)).otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when(F.col(half_col) == 1, F.col(cnt_col)).otherwise(0)
        ).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    tot = c.groupBy().agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    scored = cum.join(F.broadcast(tot)).withColumn(
        "d_ppm",
        F.expr(
            "abs(cum_a * n_b - cum_b * n_a) * 1000000L div (n_a * n_b)"
        ),
    )
    pick = scored.groupBy("n_a", "n_b").agg(
        F.min(
            F.struct((-F.col("d_ppm")).alias("nd"), F.col("v").alias("v"))
        ).alias("__w")
    )
    return (
        pick.select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("__w.v").alias("ks_at_value"),
            (-F.col("__w.nd")).cast("bigint").alias("ks_ppm"),
            F.expr(
                "cast(round(1.628 * sqrt(cast(n_a + n_b as double) /"
                " (cast(n_a as double) * cast(n_b as double))) * 1000000)"
                " as bigint)"
            ).alias("crit_ppm_a01"),
        )
        .withColumn(
            "reject", (F.col("ks_ppm") > F.col("crit_ppm_a01")).cast("int")
        )
    )


def cusum_from_counts(
    counts: DataFrame,
    key_col: str = "event_type",
    bucket_col: str = "hour_idx",
    cnt_col: str = "c",
) -> DataFrame:
    """CUSUM changepoint per key from a (key, bucket, count) table —
    WHERE the rate shifted, not just that a bucket is anomalous: over
    the ordered bucket series, the integer statistic
    S_h = H·(running count) − h·(total) is the classic CUSUM against
    the constant-rate null SCALED BY H·T so it stays an exact BIGINT
    (no float mean is ever computed); the changepoint is the bucket
    maximizing |S_h| (earliest on ties — min-struct argmax, pinned).
    One per-key window over the keys×buckets table (never the raw
    stream), one argmax aggregate. Shared by queries.
    q_cusum_changepoint and streaming.aggregate_sink.cusum_readout.
    Output: (key, n_buckets, total_events, cp_<bucket>, cusum_stat)
    ordered by key."""
    from pyspark.sql.window import Window  # noqa: PLC0415

    hb = counts.select(
        F.col(key_col).alias("__k"),
        F.col(bucket_col).alias("__b"),
        F.col(cnt_col).cast("bigint").alias("__c"),
    )
    w = Window.partitionBy("__k").orderBy("__b")
    tot = hb.groupBy("__k").agg(
        F.sum("__c").alias("__t"), F.count(F.lit(1)).alias("__h")
    )
    s = (
        hb.withColumn("run", F.sum("__c").over(w))
        .withColumn("idx", F.row_number().over(w))
        .join(F.broadcast(tot), "__k")
        .withColumn(
            "stat",
            F.abs(F.col("__h") * F.col("run") - F.col("idx") * F.col("__t")),
        )
    )
    pick = s.groupBy("__k").agg(
        F.max("__h").cast("bigint").alias("n_buckets"),
        F.max("__t").cast("bigint").alias("total_events"),
        F.min(
            F.struct((-F.col("stat")).alias("ns"), F.col("__b").alias("bi"))
        ).alias("__w"),
    )
    return pick.select(
        F.col("__k").alias(key_col),
        "n_buckets",
        "total_events",
        F.col("__w.bi").cast("bigint").alias(f"cp_{bucket_col}"),
        (-F.col("__w.ns")).cast("bigint").alias("cusum_stat"),
    ).orderBy(key_col)
