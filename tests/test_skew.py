"""Salted join/agg: exact semantic equality with the unsalted plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.skew import (
    salted_count_by_key,
    salted_join,
)


def _skewed(spark):
    # 900 rows of hot key 1, a few of everything else
    rows = [(1, f"v{i}") for i in range(900)] + [(k, f"v{k}") for k in range(2, 12)]
    return spark.createDataFrame(rows, ["k", "payload"])


def _dim(spark):
    return spark.createDataFrame([(k, f"name_{k}") for k in range(1, 12)], ["k", "name"])


def test_salted_join_equals_plain_join(spark):
    big, dim = _skewed(spark), _dim(spark)
    plain = big.join(dim, "k").select("k", "payload", "name")
    salted = salted_join(big, dim, "k", n_salts=4).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join(spark):
    big = _skewed(spark).union(spark.createDataFrame([(99, "orphan")], ["k", "payload"]))
    salted = salted_join(big, _dim(spark), "k", n_salts=4, how="left")
    orphan = [r for r in salted.collect() if r["k"] == 99]
    assert len(orphan) == 1 and orphan[0]["name"] is None


def test_salted_count(spark):
    out = {r["k"]: r["n"] for r in salted_count_by_key(_skewed(spark), "k").collect()}
    assert out[1] == 900
    assert all(out[k] == 1 for k in range(2, 12))


def test_salt_spreads_hot_key(spark):
    """The hot key really lands in multiple salt buckets (the point)."""
    big = _skewed(spark)
    n = (
        big.withColumn(
            "salt",
            F.pmod(F.xxhash64(F.col("k"), F.monotonically_increasing_id()), F.lit(4)).cast("int"),
        )
        .filter(F.col("k") == 1)
        .select("salt")
        .distinct()
        .count()
    )
    assert n > 1


def test_join_blowup_profile_forecasts_exact_join_size(spark):
    """The forecast must equal the materialized join's actual row count,
    computed without materializing it — on an asymmetric pair with a
    clear blowup key."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.skew import (
        join_blowup_profile,
    )

    left = spark.createDataFrame(
        [("hot",)] * 100 + [("a",)] * 5 + [("b",)] * 2, "k string"
    )
    right = spark.createDataFrame(
        [("hot",)] * 50 + [("a",)] * 4 + [("c",)] * 9, "k string"
    )
    prof = join_blowup_profile(left, right, "k", top_n=10).collect()
    actual = left.join(right, "k").count()
    assert prof[0].total_out == actual == 100 * 50 + 5 * 4
    assert (prof[0].key, prof[0].out_rows) == ("hot", 5000)
    assert prof[0].share_ppm == 5000 * 1_000_000 // 5020
    # 'b' and 'c' never match: absent from the profile entirely
    assert {r.key for r in prof} == {"hot", "a"}
