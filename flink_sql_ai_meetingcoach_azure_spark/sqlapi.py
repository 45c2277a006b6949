"""SQL-facing surface: register the engine's functions with ``spark.udf``
so the reference's Flink SQL statements port ~1:1 into ``spark.sql``.

Reference statement shapes covered (terraform/generate_personalized_commands.sh):

- ``ML_CHARACTER_TEXT_SPLITTER(text, 200, 20, '###', false, false, true,
  'START')`` (:322-327) → ``ml_character_text_splitter(...)`` — same 8
  positional parameters;
- ``LATERAL TABLE(ML_PREDICT('openaiembed', chunks))`` (:332-335) →
  ``ml_embed('openaiembed', chunks)`` (1-in-1-out lateral joins collapse to
  scalar calls in Spark SQL);
- ``LATERAL TABLE(ml_predict('coaching_response_generator', prompt))``
  (:417-432) → ``ml_generate('coaching_response_generator', prompt)``;
- ``VECTOR_SEARCH(tbl, k, DESCRIPTOR(col), q)`` (:379-384) is a
  table-valued operator → :func:`register_vector_search_view` materializes
  the equivalent join as a temp view (Spark SQL has no user-defined TVFs
  that take tables as arguments).

Model dispatch: Flink passes the model name as a SQL literal; here the
registered functions capture the :class:`ModelRegistry` and dispatch on the
first argument, so new ``CREATE MODEL`` equivalents (``registry.register_*``)
are callable from SQL with no re-registration.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_sql_ai_meetingcoach_azure_spark.functions.chunking import chunk_text
from flink_sql_ai_meetingcoach_azure_spark.models.registry import ModelRegistry
from flink_sql_ai_meetingcoach_azure_spark.operators.vector_search import vector_search


def register_engine_sql(spark: SparkSession, registry: ModelRegistry) -> None:
    """Register the engine's SQL functions on this session."""

    @F.udf(T.ArrayType(T.StringType()))
    def ml_character_text_splitter(
        text, chunk_size, chunk_overlap, separator, is_regex, trim, keep_separator, position
    ):
        return chunk_text(
            text,
            int(chunk_size),
            int(chunk_overlap),
            separator,
            bool(is_regex),
            bool(trim),
            bool(keep_separator),
            position,
        )

    spark.udf.register("ml_character_text_splitter", ml_character_text_splitter)

    # model-dispatching inference functions: Arrow-batched, grouped by model
    # name within each batch so providers still see amortized batches
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def ml_embed(model: pd.Series, text: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(text), dtype=object)
        for name in model.unique():
            mask = model == name
            provider = registry.get(name).provider
            out[mask] = pd.Series(
                provider.embed(text[mask].tolist()), index=text[mask].index
            )
        return out

    spark.udf.register("ml_embed", ml_embed.asNondeterministic())

    @F.pandas_udf(T.StringType())
    def ml_generate(model: pd.Series, prompt: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(prompt), dtype=object)
        for name in model.unique():
            mask = model == name
            provider = registry.get(name).provider
            out[mask] = pd.Series(
                provider.generate(prompt[mask].tolist()), index=prompt[mask].index
            )
        return out

    spark.udf.register("ml_generate", ml_generate.asNondeterministic())
    register_sketch_sql(spark)


def register_sketch_sql(spark: SparkSession) -> None:
    """SQL surface for the sketch family (VERDICT r5 #8): the Count-Min /
    HyperLogLog / KMV building blocks as Spark SQL *scalar functions*
    (``CREATE FUNCTION ... RETURN <expr>`` — pure Catalyst expressions,
    codegen'd and constant-foldable, never a Python UDF). Constants and
    hash layout mirror queries.q_countmin_sketch / q_hll_vocab /
    q_kmv_overlap exactly, so a SQL user composes the same sketches the
    DataFrame entries build:

    - ``sketch_hash60(s)`` — the fixed 60-bit md5 BIGINT hash every
      sketch derives from (functions/hashing.md5_bigint_col);
    - ``cm_bucket(s, r)`` — Count-Min bucket for hash row r (w=512);
    - ``hll_bucket(s)`` / ``hll_rho(s)`` — HLL register coordinates
      (m=1024, rho in [1, 51]);
    - ``hll_estimate(nonzero, s_nonzero)`` — the estimate from the two
      exact-BIGINT register aggregates (with the small-range correction);
    - ``kmv_est_ppm(kmv_inter, u_n)`` — KMV Jaccard ppm, zero-guarded.
    """
    m, r_max = 1024, 51  # queries.HLL_M / HLL_R
    alpha = 0.7213 / (1 + 1.079 / m)
    h = "CAST(conv(substring(md5({s}), 1, 15), 16, 10) AS BIGINT)"
    fns = [
        f"sketch_hash60(s STRING) RETURNS BIGINT RETURN {h.format(s='s')}",
        # Count-Min row-r bucket: salted hash % width (queries.CM_W = 512)
        "cm_bucket(s STRING, r INT) RETURNS BIGINT RETURN "
        + h.format(s="concat(s, ':cm', CAST(r AS STRING))")
        + " % 512",
        f"hll_bucket(s STRING) RETURNS BIGINT RETURN {h.format(s='s')} % {m}",
        "hll_rho(s STRING) RETURNS BIGINT RETURN "
        f"CASE WHEN {h.format(s='s')} div {m} = 0 THEN {r_max} "
        f"ELSE {r_max} - length(bin({h.format(s='s')} div {m})) END",
        "hll_estimate(nonzero BIGINT, s_nonzero BIGINT) RETURNS DOUBLE RETURN "
        f"CASE WHEN {alpha!r} * {m} * {m} * CAST(shiftleft(1L, {r_max}) AS DOUBLE)"
        f" / CAST(s_nonzero + ({m} - nonzero) * shiftleft(1L, {r_max}) AS DOUBLE)"
        f" <= 2.5 * {m} AND nonzero < {m} "
        f"THEN round(CAST({m} AS DOUBLE)"
        f" * ln(CAST({m} AS DOUBLE) / CAST({m} - nonzero AS DOUBLE)), 6) "
        f"ELSE round({alpha!r} * {m} * {m} * CAST(shiftleft(1L, {r_max}) AS DOUBLE)"
        f" / CAST(s_nonzero + ({m} - nonzero) * shiftleft(1L, {r_max}) AS DOUBLE),"
        " 6) END",
        "kmv_est_ppm(kmv_inter BIGINT, u_n BIGINT) RETURNS BIGINT RETURN "
        "kmv_inter * 1000000L div greatest(u_n, 1L)",
        # HDR log-scale quantile sketch (queries.HDR_SUB = 32): bucket id
        # and exact-integer bucket lower bound for a positive BIGINT value
        "hdr_bucket(v BIGINT) RETURNS BIGINT RETURN "
        "(length(bin(v)) - 1) * 32 + v * 32 div shiftleft(1L, length(bin(v)) - 1) - 32",
        "hdr_lo(bucket BIGINT) RETURNS BIGINT RETURN "
        "(32 + bucket % 32) * shiftleft(1L, bucket div 32) div 32",
        # exact-distinct bitmap words (queries.q_bitmap_distinct's layout):
        # SELECT k, sum(bit_count(w)) FROM (SELECT k, bitmap_word(id) wi,
        #   bit_or(bitmap_bit(id)) w ... GROUP BY k, wi) GROUP BY k
        "bitmap_word(id BIGINT) RETURNS BIGINT RETURN id div 64",
        "bitmap_bit(id BIGINT) RETURNS BIGINT RETURN "
        "shiftleft(CAST(1 AS BIGINT), CAST(id % 64 AS INT))",
    ]
    for f in fns:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {f}")


def register_vector_search_view(
    spark: SparkSession,
    view_name: str,
    query_table: str,
    index_table: str,
    k: int = 3,
    query_col: str = "embedding",
    index_col: str = "embedding",
    payload_cols: list[str] | None = None,
    output_col: str = "search_results",
) -> None:
    """``LATERAL TABLE(VECTOR_SEARCH(index, k, DESCRIPTOR(col), q.col))`` as
    a named view over registered tables — subsequent SQL selects from it."""
    out = vector_search(
        spark.table(query_table),
        spark.table(index_table),
        k=k,
        query_col=query_col,
        index_col=index_col,
        payload_cols=payload_cols,
        output_col=output_col,
    )
    out.createOrReplaceTempView(view_name)
