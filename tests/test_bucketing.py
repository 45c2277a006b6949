"""Bucketed co-located join: pre-bucketing both sides on the join key lets
the join run with ZERO shuffle — the strategy PLANS.md prescribes when a
dim outgrows broadcast at cluster scale."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path, sf_dir):
    # (warehouse dir is a static conf — managed tables land in the default
    # warehouse and are dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_partkey", "l_quantity"
        )
        part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_name"
        )
        li.write.bucketBy(4, "l_partkey").sortBy("l_partkey").mode("overwrite").saveAsTable("li_b")
        part.write.bucketBy(4, "p_partkey").sortBy("p_partkey").mode("overwrite").saveAsTable("part_b")

        joined = spark.table("li_b").join(
            spark.table("part_b"), F.col("l_partkey") == F.col("p_partkey")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        # and it actually runs correctly
        plain = li.join(part, F.col("l_partkey") == F.col("p_partkey")).count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS part_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
