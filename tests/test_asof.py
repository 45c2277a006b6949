"""As-of join semantics: at-or-before, per-key, null when nothing precedes;
cross-checked against pandas merge_asof on random data."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from flink_sql_ai_meetingcoach_azure_spark.operators.asof_join import asof_join


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def test_basic_semantics(spark):
    trades = spark.createDataFrame(
        [("A", _ts(5), 100.0), ("A", _ts(10), 101.0), ("B", _ts(3), 50.0)],
        ["sym", "t_ts", "px"],
    )
    quotes = spark.createDataFrame(
        [("A", _ts(4), 99.5), ("A", _ts(9), 100.5), ("B", _ts(7), 49.0)],
        ["sym", "q_ts", "bid"],
    )
    out = {
        (r["sym"], r["t_ts"]): r["bid"]
        for r in asof_join(trades, quotes, "sym", "t_ts", "q_ts", ["bid"]).collect()
    }
    assert out[("A", _ts(5))] == 99.5   # quote@4 is latest <= 5
    assert out[("A", _ts(10))] == 100.5 # quote@9
    assert out[("B", _ts(3))] is None   # no quote precedes


def test_inclusive_equal_ts(spark):
    left = spark.createDataFrame([("A", _ts(5), 1)], ["k", "lt", "x"])
    right = spark.createDataFrame([("A", _ts(5), 7.0)], ["k", "rt", "v"])
    out = asof_join(left, right, "k", "lt", "rt", ["v"]).head()
    assert out["v"] == 7.0  # right row at the same instant counts


def test_matches_pandas_merge_asof(spark):
    rng = np.random.RandomState(7)
    left_p = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 200),
        "lts": pd.to_datetime(rng.randint(0, 10_000, 200), unit="s"),
        "lval": np.arange(200),
    })
    right_p = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 80),
        "rts": pd.to_datetime(rng.choice(np.arange(0, 10_000, 7), 80, replace=False), unit="s"),
        "rval": np.arange(80) * 1.5,
    })
    expected = pd.merge_asof(
        left_p.sort_values("lts"), right_p.sort_values("rts"),
        left_on="lts", right_on="rts", by="k",
    )
    got = asof_join(
        spark.createDataFrame(left_p), spark.createDataFrame(right_p),
        "k", "lts", "rts", ["rval"],
    ).toPandas()
    merged = expected[["k", "lval", "rval"]].sort_values(["k", "lval"]).reset_index(drop=True)
    ours = got[["k", "lval", "rval"]].sort_values(["k", "lval"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, ours, check_dtype=False)
