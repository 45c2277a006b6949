"""Session factory + cluster sizing profile."""

from __future__ import annotations

from flink_sql_ai_meetingcoach_azure_spark.session import cluster_scale_conf


def test_cluster_scale_conf_sizing_rules():
    c = cluster_scale_conf(target_tb=100.0, executors=1000, executor_cores=4)
    # shuffle tasks sized for ~160MB of post-pruning shuffle input each
    n = int(c["spark.sql.shuffle.partitions"])
    assert n >= 2 * 1000 * 4  # never below 2 waves of total cores
    assert n * 160 * 1024**2 >= 100 * (1024**4) / 4  # covers the shuffle bytes
    # a tiny job never drops below two waves of the cluster's cores
    tiny = cluster_scale_conf(target_tb=0.001, executors=10, executor_cores=4)
    assert int(tiny["spark.sql.shuffle.partitions"]) == 2 * 10 * 4
    # AQE + skew handling always on; broadcasts capped, not disabled
    assert c["spark.sql.adaptive.enabled"] == "true"
    assert int(c["spark.sql.autoBroadcastJoinThreshold"]) == 64 * 1024**2


def test_cluster_scale_conf_applies_to_a_session():
    """The dict must be pure session-level conf Spark accepts (keys that
    need cluster infrastructure are still settable; nothing typo'd)."""
    from flink_sql_ai_meetingcoach_azure_spark.session import get_spark

    conf = cluster_scale_conf(target_tb=0.01, executors=2, executor_cores=2)
    # executor/state-store keys are cluster-runtime; the SQL ones must apply
    sql_keys = {k: v for k, v in conf.items() if k.startswith("spark.sql.")
                and "stateStore" not in k}
    spark = get_spark("scale-conf-test")
    # the JVM session is a singleton shared with other test modules —
    # restore exact prior values, never unset-to-default
    prev = {}
    for k in sql_keys:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — key unset before
            prev[k] = None
    try:
        for k, v in sql_keys.items():
            spark.conf.set(k, v)
            assert spark.conf.get(k) == v
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
