"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced to full materialization with a noop-format write (no
driver collect bottleneck — measures the distributed plan, not result
transfer).

Every query runs N_RUNS=3 times in-process and reports the PER-QUERY MEDIAN
(the suite value is the sum of medians): a single host stall — the VM noise
mode documented in BASELINE.md — then skews one run, not the artifact.
``ann_ivf_topk`` is special-cased: its first (cold) run builds the IVF index
and is reported as-is (build+probe), then the cached-index steady-state
probes report separately as ``ann_ivf_probe`` — an IVF index is built once
and probed many times in any real deployment, so query cost is the probe.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_sql_ai_meetingcoach_azure_spark import get_spark  # noqa: E402
from flink_sql_ai_meetingcoach_azure_spark.queries import QUERIES  # noqa: E402

BENCH_QUERIES = [
    # relational core
    "tpch_q1",
    "join_revenue_by_nation",
    "topn_per_user",
    "window_running_sum",
    "tumbling_window",
    "session_window",
    "explode_chunks",
    # dedup / fingerprint family
    "dedup_exact",
    "dedup_keep_best",
    "minhash_signatures",
    "lsh_pairs",
    "simhash",
    "simhash_pairs",
    "neardup_dedup",
    "fingerprint",
    # similarity search
    "ann_topk",
    "ann_ivf_topk",
    "embedding_cosine_pairs",
    "embedding_lsh_pairs",
    # joins beyond the reference
    "asof_join",
    # text analysis
    "lang_id",
    "quality_score",
    "token_stats",
    "top_terms",
    "length_percentiles",
    # curation: dedup + stratified downsample + split composed
    "curation_pipeline",
    # PII scrub + sequence packing (beyond-reference curation ops)
    "pii_redact",
    "pack_sequences",
    # multimodal plumbing
    "multimodal_features",
    # SQL DDL statement path (translator overhead ~0: same operators)
    "ddl_ctas_topn",
    # RAG pipeline end-to-end (mock provider): correctness-shaped + bulk
    "rag_pipeline",
    "rag_pipeline_bulk",
    # hash-verified chains (oracle reproduces embed/retrieve/generate in SQL)
    "rag_retrieval",
    "rag_pipeline_verified",
]


N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    # JVM/codegen warmup so query timings measure the plan, not JIT
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_once(name: str) -> float:
        t0 = time.time()
        df = QUERIES[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def median(name: str, n: int = N_RUNS) -> float:
        return sorted(run_once(name) for _ in range(n))[n // 2]

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name == "ann_ivf_topk":
            from flink_sql_ai_meetingcoach_azure_spark.queries import _IVF_CACHE  # noqa: PLC0415

            _IVF_CACHE.clear()
            timings[name] = run_once(name)  # cold: index build + probe
            timings["ann_ivf_probe"] = median(name)  # steady state: probe only
        else:
            timings[name] = median(name)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
