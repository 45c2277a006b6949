"""Ad-hoc per-entry profiling harness for the optimization rounds.

Times whole registry entries with the same noop-sink/median methodology as
bench.py but over an arbitrary subset, warm (after one untimed run), so
stage-level experiments are comparable run to run.

Usage: python tools/profile_entry.py sf_dir entry [entry ...] [--runs N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_sql_ai_meetingcoach_azure_spark import get_spark  # noqa: E402
from flink_sql_ai_meetingcoach_azure_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = args[0]
    names = args[1:]
    spark = get_spark("profile")
    for name in names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}:warmup")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}:{i}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        print(
            f"{name}: median {statistics.median(ts):.3f}  "
            f"min {min(ts):.3f}  runs {['%.3f' % t for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
