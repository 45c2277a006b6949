"""Int8 embedding quantization + quantized vector search.

Symmetric per-vector int8 quantization (q_i = round(x_i / s), s =
max|x|/127) shrinks a broadcast ANN index 4× vs float32 — at 100 TB that
moves the broadcast ceiling 4× before the IVF on-disk path
(:func:`~.vector_search.write_ivf_index`) has to take over, and it is the
standard serving trick for embedding stores. Reconstruction x̂ = q·s is
exact float64 arithmetic on both engines, so quantized similarities are
oracle-reproducible: the DuckDB oracle computes ``round(x/s)*s`` and the
engine computes ``int8 * s`` — identical doubles, and the 6-dp similarity
round absorbs GEMM summation-order ulps exactly as the LSH/GEMM operators
do.

Quantization itself is pure Catalyst expressions (map-only, codegen); only
the search broadcast materializes int8 numpy matrices.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import (
    MAX_BROADCAST_INDEX_ROWS,
    _collect_index_rows,
)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q_vec",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Append symmetric int8 quantization columns: ``q_col ARRAY<TINYINT>``
    and ``scale_col DOUBLE`` (s = max|x|/127; an all-zero vector gets s=0
    and all-zero codes). Pure column expressions — stays inside the scan's
    WholeStageCodegen at any scale."""
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    s = (maxabs / F.lit(127.0)).alias(scale_col)
    q = F.when(
        maxabs == 0,
        F.transform(v, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            v, lambda x: F.round(x.cast("double") / (maxabs / F.lit(127.0))).cast("tinyint")
        )
    )
    return df.withColumn(scale_col, s).withColumn(q_col, q)


def dequantize_col(q_col: str | Column, scale_col: str | Column) -> Column:
    """x̂ = q · s as ARRAY<DOUBLE> — exact reconstruction arithmetic."""
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    return F.transform(q, lambda e: e.cast("double") * s)


def vector_search_topk_quantized(
    query_df: DataFrame,
    index_df: DataFrame,
    k: int = 3,
    query_col: str = "embedding",
    index_col: str = "embedding",
    payload_cols: list[str] | None = None,
    sim_col: str = "similarity",
    rank_col: str = "search_rank",
    round_sim: int = 6,
    max_index_rows: int | None = MAX_BROADCAST_INDEX_ROWS,
) -> DataFrame:
    """Flat top-k cosine search against an int8-QUANTIZED broadcast index.

    The driver collects (payload, int8 codes, scale) — 4× smaller than the
    float32 index, so ``max_index_rows`` stretches accordingly — and each
    Arrow batch dequantizes to float64 and GEMMs executor-side. Queries
    stay full-precision. Output shape/tie-break matches
    :func:`~.vector_search.vector_search_topk_flat`: one row per (query,
    hit), ranked by (similarity desc, first payload col asc) after the
    ``round_sim`` rounding — deterministic across engines and runs.
    """
    import pyspark.sql.types as T  # noqa: PLC0415

    payload_cols = payload_cols or [c for c in index_df.columns if c != index_col]
    spark = query_df.sparkSession

    qz = quantize_embeddings(index_df, index_col, "__q", "__s")
    idx_rows = _collect_index_rows(
        qz.select(*payload_cols, "__q", "__s"), [*payload_cols, "__q", "__s"], max_index_rows
    )
    codes = np.asarray([r["__q"] for r in idx_rows], dtype=np.int8)
    scales = np.asarray([r["__s"] for r in idx_rows], dtype=np.float64)
    payloads = [{c: r[c] for c in payload_cols} for r in idx_rows]
    bc = spark.sparkContext.broadcast((codes, scales, payloads))

    out_schema = T.StructType(
        list(query_df.schema.fields)
        + [index_df.schema[c] for c in payload_cols]
        + [
            T.StructField(sim_col, T.DoubleType()),
            T.StructField(rank_col, T.IntegerType()),
        ]
    )
    first_payload = payload_cols[0]

    def _search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codes_l, scales_l, payloads_l = bc.value
        # dequantize ONCE per executor/batch-stream, not per batch
        mat = codes_l.astype(np.float64) * scales_l[:, None]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat_n = mat / norms[:, None]
        pay_keys = np.asarray([p[first_payload] for p in payloads_l])
        for pdf in batches:
            if pdf.empty:
                continue
            qm = np.asarray(list(pdf[query_col]), dtype=np.float64)
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0] = 1.0
            sims = np.round((qm / qn[:, None]) @ mat_n.T, round_sim)
            kk = min(k, sims.shape[1])
            out_rows = []
            for row_i in range(sims.shape[0]):
                # exact tie-break: (-sim, first payload) like the flat path
                order = np.lexsort((pay_keys, -sims[row_i]))[:kk]
                base = pdf.iloc[row_i].to_dict()
                for rk, j in enumerate(order, start=1):
                    out_rows.append(
                        {**base, **payloads_l[j], sim_col: sims[row_i, j], rank_col: rk}
                    )
            yield pd.DataFrame(out_rows)

    return query_df.mapInPandas(_search, schema=out_schema)
