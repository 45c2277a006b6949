"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet dir, compare
row count + sorted-column names + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from flink_sql_ai_meetingcoach_azure_spark import get_spark  # noqa: E402
from flink_sql_ai_meetingcoach_azure_spark.queries import QUERIES  # noqa: E402
from flink_sql_ai_meetingcoach_azure_spark.sources.tables import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if spec.sql is None:
            ok = len(s_rows) > 0
            print(f"{'ok  ' if ok else 'FAIL'} {name}: rows-only, {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if not ok:
                failures.append(name)
            continue
        try:
            rel = con.sql(spec.sql)
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            failures.append(name)
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            failures.append(name)
            continue
        ns, nd = norm_rows(s_cols, [tuple(r) for r in s_rows]), norm_rows(d_cols, d_rows)
        if ns != nd:
            diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diff}")
            failures.append(name)
            continue
        print(f"ok   {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
