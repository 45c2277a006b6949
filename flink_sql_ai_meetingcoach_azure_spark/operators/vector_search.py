"""Similarity / vector search operator.

Reference semantics: ``LATERAL TABLE(VECTOR_SEARCH(knowledge_mongodb, 3,
DESCRIPTOR(embedding), qe.embedding))`` — a correlated ANN lookup against a
MongoDB Atlas cosine index (1536-dim, numCandidates=150) appending
``search_results ARRAY<ROW<document_id, chunks, embedding>>``
(reference: terraform/generate_personalized_commands.sh:377-402;
index: terraform/main.tf:649-669).

Spark-first design (SURVEY.md §4.3.2):

- **Exact** (v0 + correctness oracle): broadcast the index table, cosine via
  JVM higher-order functions, per-query top-k via ``row_number`` window.
  Exact search ⊇ ANN for correctness (ANN approximates exact). The
  broadcast hash join keeps the coaching pipeline shuffle-free except the
  per-query-key window — and with AQE the window input is already
  hash-partitioned by query id only once.
- **Pandas/numpy path** (``method='numpy'``): per-partition matrix multiply
  against a broadcast (n_index × dim) float32 matrix via ``mapInPandas``;
  one BLAS GEMM per Arrow batch instead of per-row array folds. This is the
  throughput path for high dims / large query streams.
- **IVF** (``nprobe``): k-means-lite centroid assignment as a partition
  column; queries probe only the ``nprobe`` nearest centroid partitions
  before brute-forcing — the 100-TB scale path where the index no longer
  broadcasts (SURVEY.md §7.4.8). Operator signature stays identical.

At 1000-executor scale: the index table is the small side (a knowledge base,
not the 100 TB fact stream) so broadcast is the right default; when the index
itself is huge, IVF-partitioned parquet with partition pruning on
``centroid_id`` bounds each probe to nprobe/nlist of the index.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.functions.vectors import (
    cosine_similarity_col,
    dot_col,
    norm_col,
)

_QID = "__query_id"

#: driver-side index materialization ceiling for the numpy/broadcast paths:
#: past this, collect+broadcast is the wrong physical strategy (at 256 dims
#: float32 this is ~1 GB of vectors before payloads) — the index belongs on
#: disk as IVF-partitioned parquet probed via :func:`vector_search_ivf_parquet`
MAX_BROADCAST_INDEX_ROWS = 1_000_000


class IndexTooLargeError(ValueError):
    """The index crossed the driver-broadcast ceiling; callers with an
    on-disk IVF index route to :func:`vector_search_ivf_parquet` instead."""


def _collect_index_rows(index_df: DataFrame, cols: list[str], max_rows: int | None) -> list:
    """Collect the index for broadcasting, guarded: the limit rides the same
    job (no extra count pass), and crossing it raises with the scale path
    spelled out instead of stalling or OOMing the driver."""
    if max_rows is None:
        return index_df.select(*cols).collect()
    rows = index_df.select(*cols).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise IndexTooLargeError(
            f"vector-search index exceeds max_index_rows={max_rows}: a "
            "driver-collected broadcast does not survive this scale. Build an "
            "on-disk IVF index (build_ivf_index + write_ivf_index) and probe "
            "it with vector_search_ivf_parquet (partition-pruned reads), pass "
            "fallback_path= to vector_search to route there automatically, or "
            "pass a larger max_index_rows explicitly if the driver can hold it."
        )
    return rows


def vector_search_topk_flat(
    query_df: DataFrame,
    index_df: DataFrame,
    k: int = 3,
    query_col: str = "embedding",
    index_col: str = "embedding",
    payload_cols: list[str] | None = None,
    sim_col: str = "similarity",
    rank_col: str = "search_rank",
    round_sim: int | None = None,
) -> DataFrame:
    """Flat top-k: one output row per (query row, matched index row).

    Deterministic tie-break: orders by (similarity desc, payload cols asc)
    — a total order when the payload is a key — so ranks are stable across
    engines and runs.
    """
    payload_cols = payload_cols or [c for c in index_df.columns if c != index_col]

    # norms are computed ONCE per side, not per pair: cosine per pair then
    # costs one zip_with dot instead of three array aggregates — the
    # difference between O(pairs·dim) and 3·O(pairs·dim) interpreted work
    q = query_df.withColumn(_QID, F.monotonically_increasing_id()).withColumn(
        "__qnorm", norm_col(query_col)
    )
    idx = index_df.select(
        *[F.col(c) for c in payload_cols], F.col(index_col).alias("__index_vec")
    ).withColumn("__inorm", norm_col("__index_vec"))
    sim = dot_col(F.col(query_col), F.col("__index_vec")) / (
        F.col("__qnorm") * F.col("__inorm")
    )
    if round_sim is not None:
        sim = F.round(sim, round_sim)
    joined = q.join(F.broadcast(idx), how="cross").withColumn(sim_col, sim)
    w = Window.partitionBy(_QID).orderBy(F.desc(sim_col), *[F.asc(c) for c in payload_cols])
    return (
        joined.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop("__index_vec", _QID, "__qnorm", "__inorm")
    )


def _round_half_away(sims: np.ndarray, ndigits: int) -> np.ndarray:
    """Round half AWAY from zero, matching SQL ``round()`` — ``np.round``
    is half-to-even, which diverges from the oracle on an exact .5 at the
    last kept decimal (the embed_and_search_numpy exact-mode contract)."""
    scale = 10.0 ** ndigits
    return np.sign(sims) * np.floor(np.abs(sims) * scale + 0.5) / scale


def vector_search_topk_flat_gemm(
    query_df: DataFrame,
    index_df: DataFrame,
    k: int = 3,
    query_col: str = "embedding",
    index_col: str = "embedding",
    payload_cols: list[str] | None = None,
    sim_col: str = "similarity",
    rank_col: str = "search_rank",
    round_sim: int | None = None,
    max_index_rows: int | None = MAX_BROADCAST_INDEX_ROWS,
) -> DataFrame:
    """GEMM form of :func:`vector_search_topk_flat` — identical rows and
    ordering (same ``round(dot/(|q|·|i|), round_sim)`` similarity, same
    (sim DESC, payload ASC) tie-break), but the pair space never
    materializes as JVM rows: each Arrow batch of queries runs ONE float64
    GEMM against the broadcast index matrix and emits only the k winners.

    Why: the cross-join form evaluates an interpreted ``zip_with`` +
    ``aggregate`` lambda per PAIR ELEMENT (O(pairs·dim) catalyst lambda
    calls) and then shuffles every pair into a per-query window sort. At
    1k queries × 1k index × 64 dims that is ~10⁸ interpreted evaluations
    for ~10⁷ FLOPs of actual math. Here the plan is map-only (no Exchange
    at all): distribution cost is one broadcast of the index, per-task
    work is vectorized BLAS (optimization guide §4.2).

    Exactness contract (what lets oracle-verified entries swap freely):
    float64 GEMM over the same float32-quantized inputs, similarity =
    dot/(qnorm·inorm) with half-AWAY-from-zero rounding (SQL ``round``),
    ties broken by the payload tuple ascending via a stable sort over the
    payload-presorted index — exactly the ``row_number() OVER (ORDER BY
    sim DESC, payload ASC)`` total order. Same broadcast-ceiling guard as
    the numpy search (``IndexTooLargeError`` past ``max_index_rows``)."""
    import pyspark.sql.types as T  # noqa: PLC0415

    payload_cols = payload_cols or [c for c in index_df.columns if c != index_col]
    spark = query_df.sparkSession
    idx_rows = _collect_index_rows(
        index_df, [*payload_cols, index_col], max_index_rows
    )
    out_schema = T.StructType(
        list(query_df.schema.fields)
        + [index_df.schema[c] for c in payload_cols]
        + [
            T.StructField(sim_col, T.DoubleType()),
            T.StructField(rank_col, T.IntegerType()),
        ]
    )
    if not idx_rows:
        # empty index: the cross join yields no rows — same here
        return spark.createDataFrame([], out_schema)
    # presort the index by the payload tuple ASC once driver-side: a stable
    # descending-sim sort over this order IS the (sim DESC, payload ASC)
    # row_number ordering, so no per-query tie handling is ever needed
    perm = sorted(
        range(len(idx_rows)), key=lambda i: tuple(idx_rows[i][c] for c in payload_cols)
    )
    mat = np.asarray([idx_rows[i][index_col] for i in perm], dtype=np.float64)
    inorm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    inorm[inorm == 0] = 1.0
    payload_vals = {
        c: np.asarray([idx_rows[i][c] for i in perm], dtype=object)
        for c in payload_cols
    }
    bc = spark.sparkContext.broadcast((mat, inorm, payload_vals))
    n_idx = len(idx_rows)
    q_cols = list(query_df.columns)

    def _search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat_l, inorm_l, pay_l = bc.value
        kk = min(k, n_idx)
        ranks = np.arange(1, kk + 1, dtype=np.int32)
        for pdf in batches:
            if pdf.empty:
                continue
            qm = np.asarray(list(pdf[query_col]), dtype=np.float64)
            qn = np.sqrt(np.einsum("ij,ij->i", qm, qm))
            qn[qn == 0] = 1.0
            sims = (qm @ mat_l.T) / (qn[:, None] * inorm_l[None, :])
            if round_sim is not None:
                sims = _round_half_away(sims, round_sim)
            # stable argsort over the payload-ASC-presorted axis = the
            # exact (sim DESC, payload ASC) ordering, ties included
            top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            b = len(pdf)
            qrep = np.repeat(np.arange(b), kk)
            flat = top.ravel()
            out = pdf.iloc[qrep].reset_index(drop=True)
            for c in payload_cols:
                out[c] = pd.Series(pay_l[c][flat])
            out[sim_col] = sims[qrep, flat]
            out[rank_col] = np.tile(ranks, b)
            yield out[q_cols + payload_cols + [sim_col, rank_col]]

    return query_df.mapInPandas(_search, schema=out_schema)


def vector_search(
    query_df: DataFrame,
    index_df: DataFrame,
    k: int = 3,
    query_col: str = "embedding",
    index_col: str = "embedding",
    payload_cols: list[str] | None = None,
    output_col: str = "search_results",
    method: str = "sql",
    max_index_rows: int | None = MAX_BROADCAST_INDEX_ROWS,
    fallback_path: str | None = None,
    fallback_nprobe: int = 4,
    round_sim: int | None = None,
) -> DataFrame:
    """LATERAL TABLE(VECTOR_SEARCH(...)) equivalent: appends
    ``output_col ARRAY<STRUCT<payload...>>`` (top-k by cosine) to every query
    row — the reference's ``search_results`` shape (:379-384).

    ``fallback_path``: an on-disk IVF index (written by
    :func:`write_ivf_index`) to route to when the index crosses the
    broadcast ceiling — past ``max_index_rows`` the search transparently
    becomes a partition-pruned :func:`vector_search_ivf_parquet` probe with
    ``fallback_nprobe`` cells instead of raising.  With
    ``fallback_nprobe >= nlist`` the probe is exhaustive, so results are
    identical to the broadcast path; smaller values trade recall for reads.

    ``round_sim``: round cosine to this many decimals BEFORE ranking (both
    routes), so the (sim DESC, payload ASC) order — including which rows
    make the k cut — is reproducible across engines regardless of float
    summation order. Required for oracle-exact entries that route-flip.
    """
    payload_cols = payload_cols or [c for c in index_df.columns if c != index_col]

    def _route_to_ivf() -> DataFrame:
        return vector_search_ivf_parquet(
            query_df,
            fallback_path,
            k=k,
            nprobe=fallback_nprobe,
            query_col=query_col,
            index_col=index_col,
            payload_cols=payload_cols,
            output_col=output_col,
            round_sim=round_sim,
        )

    if method == "numpy":
        try:
            return _vector_search_numpy(
                query_df, index_df, k, query_col, index_col, payload_cols, output_col,
                max_index_rows=max_index_rows, round_sim=round_sim,
            )
        except IndexTooLargeError:
            if fallback_path is None:
                raise
            return _route_to_ivf()
    # the sql path broadcasts JVM-side (no driver collect), so it is only
    # guarded when a fallback exists to route to — the size check is one
    # limit-riding count, paid solely by fallback users
    if fallback_path is not None and max_index_rows is not None:
        if index_df.limit(max_index_rows + 1).count() > max_index_rows:
            return _route_to_ivf()

    q = query_df.withColumn(_QID, F.monotonically_increasing_id()).withColumn(
        "__qnorm", norm_col(query_col)
    )
    idx = index_df.select(
        *payload_cols, F.col(index_col).alias("__index_vec")
    ).withColumn("__inorm", norm_col("__index_vec"))
    sim = (
        dot_col(F.col(query_col), F.col("__index_vec"))
        / (F.col("__qnorm") * F.col("__inorm"))
    ).alias("__sim")
    if round_sim is not None:
        sim = F.round(sim, round_sim).alias("__sim")
    joined = q.join(F.broadcast(idx), how="cross").withColumn("__sim", sim)
    w = Window.partitionBy(_QID).orderBy(F.desc("__sim"), *[F.asc(c) for c in payload_cols])
    ranked = joined.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)
    result_struct = F.struct(*[F.col(c) for c in payload_cols])
    agg = ranked.groupBy(_QID).agg(
        *[F.first(c).alias(c) for c in query_df.columns],
        F.sort_array(F.collect_list(F.struct(F.col("__rk").alias("r"), result_struct.alias("s"))))
        .alias("__pairs"),
    )
    return agg.select(
        *query_df.columns,
        F.transform(F.col("__pairs"), lambda p: p["s"]).alias(output_col),
    )


def _vector_search_numpy(
    query_df: DataFrame,
    index_df: DataFrame,
    k: int,
    query_col: str,
    index_col: str,
    payload_cols: list[str],
    output_col: str,
    max_index_rows: int | None = MAX_BROADCAST_INDEX_ROWS,
    round_sim: int | None = None,
) -> DataFrame:
    """Broadcast the index as numpy matrices; per-Arrow-batch GEMM top-k.

    No shuffle at all: each partition of the query stream computes its own
    top-k against the shared read-only index — the plan stays narrow, which
    is what survives a 1000-executor scale-up for a broadcastable index.
    """
    import pyspark.sql.types as T  # noqa: PLC0415

    spark = query_df.sparkSession
    idx_rows = _collect_index_rows(index_df, [*payload_cols, index_col], max_index_rows)
    mat = np.asarray([r[index_col] for r in idx_rows], dtype=np.float32)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat_n = mat / norms[:, None]
    payloads = [{c: r[c] for c in payload_cols} for r in idx_rows]
    bc = spark.sparkContext.broadcast((mat_n, payloads))

    q_fields = query_df.schema.fields
    out_schema = T.StructType(
        list(q_fields)
        + [
            T.StructField(
                output_col,
                T.ArrayType(
                    T.StructType(
                        [index_df.schema[c] for c in payload_cols]
                    )
                ),
            )
        ]
    )

    def _search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat_n_l, payloads_l = bc.value
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(**{output_col: []})
                continue
            qm = np.asarray(list(pdf[query_col]), dtype=np.float32)
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0] = 1.0
            sims = (qm / qn[:, None]) @ mat_n_l.T  # (batch, n_index) GEMM
            if round_sim is not None:
                sims = np.round(sims, round_sim)
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            results = []
            for row_i in range(sims.shape[0]):
                cand = top[row_i]
                order = cand[np.argsort(-sims[row_i, cand], kind="stable")]
                results.append([payloads_l[j] for j in order])
            pdf = pdf.copy()
            pdf[output_col] = results
            yield pdf

    return query_df.mapInPandas(_search, schema=out_schema)


def embed_and_search_numpy(
    query_df: DataFrame,
    index_df: DataFrame,
    provider,
    k: int = 3,
    text_col: str = "message",
    index_col: str = "embedding",
    payload_cols: list[str] | None = None,
    embed_col: str = "embedding",
    output_col: str = "search_results",
    exact: bool = False,
    max_index_rows: int | None = MAX_BROADCAST_INDEX_ROWS,
    fallback_path: str | None = None,
    fallback_nprobe: int = 4,
) -> DataFrame:
    """Fused embed + retrieve: ONE ``mapInPandas`` stage computes the
    embedding (provider batch call) and the GEMM top-k against the broadcast
    index for each Arrow batch.

    ``fallback_path``: like :func:`vector_search`, an on-disk IVF index to
    route to past the broadcast ceiling — the fused stage un-fuses into an
    embed pandas-UDF followed by a partition-pruned
    :func:`vector_search_ivf_parquet` probe (same output schema: query
    columns + ``embed_col`` + ``output_col``).  The un-fused shape is the
    right trade past ~1M index rows: the Arrow round-trip it re-pays is
    dwarfed by not broadcasting the index at all.

    Unfused, the pipeline pays two Python worker stages back-to-back (embed
    pandas-UDF, then search ``mapInPandas``) with a full Arrow
    serialize/deserialize round-trip of the embedding column between them —
    at 256+ dims that intermediate is wider than the text itself. Fusing
    halves the Python-stage count of the coaching pipeline's hot path and
    keeps the plan narrow (no shuffle at all).

    ``exact=True`` makes the ranking engine-reproducible for correctness
    oracles: vectors are ASSUMED pre-normalized (skipping the float32
    renormalization), the GEMM runs in float64 over the float32-quantized
    components, similarities are rounded to 6 dp and ties break
    lexicographically on the payload tuple — exactly the ordering a SQL
    oracle computes with ``round(dot, 6) DESC, payload...``. GEMM cost is
    unchanged at knowledge-base scale (the embed call dominates); the
    default float32 path remains the raw-throughput mode.
    """
    import pyspark.sql.types as T  # noqa: PLC0415

    payload_cols = payload_cols or [c for c in index_df.columns if c != index_col]
    spark = query_df.sparkSession
    try:
        idx_rows = _collect_index_rows(index_df, [*payload_cols, index_col], max_index_rows)
    except IndexTooLargeError:
        if fallback_path is None:
            raise

        @F.pandas_udf("array<float>")
        def _embed_udf(s: pd.Series) -> pd.Series:
            return pd.Series(provider.embed(s.tolist()))

        embedded = query_df.withColumn(
            embed_col, _embed_udf.asNondeterministic()(F.col(text_col))
        )
        return vector_search_ivf_parquet(
            embedded,
            fallback_path,
            k=k,
            nprobe=fallback_nprobe,
            query_col=embed_col,
            index_col=index_col,
            payload_cols=payload_cols,
            output_col=output_col,
        )
    mat = np.asarray([r[index_col] for r in idx_rows], dtype=np.float32)
    if exact:
        mat_n = mat.astype(np.float64)
        payload_keys = [tuple(str(r[c]) for c in payload_cols) for r in idx_rows]
    else:
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat_n = mat / norms[:, None]
        payload_keys = None
    payloads = [{c: r[c] for c in payload_cols} for r in idx_rows]
    bc = spark.sparkContext.broadcast((mat_n, payloads, payload_keys))

    out_schema = T.StructType(
        list(query_df.schema.fields)
        + [
            T.StructField(embed_col, T.ArrayType(T.FloatType())),
            T.StructField(
                output_col,
                T.ArrayType(T.StructType([index_df.schema[c] for c in payload_cols])),
            ),
        ]
    )

    def _fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat_n_l, payloads_l, keys_l = bc.value
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(**{embed_col: [], output_col: []})
                continue
            qm = np.asarray(provider.embed(pdf[text_col].tolist()), dtype=np.float32)
            if exact:
                # round half AWAY from zero, matching SQL round() — np.round
                # is half-to-even, which diverges from the oracle on an
                # exact .5 at the 6th decimal
                raw = qm.astype(np.float64) @ mat_n_l.T
                sims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
            else:
                qn = np.linalg.norm(qm, axis=1)
                qn[qn == 0] = 1.0
                sims = (qm / qn[:, None]) @ mat_n_l.T
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            results = []
            for row_i in range(sims.shape[0]):
                cand = top[row_i]
                if exact:
                    # rounded sims tie often; pull in EVERY candidate at or
                    # above the kth value, then order by (-sim, payload) —
                    # the oracle's row_number ordering
                    row = sims[row_i]
                    cand = np.flatnonzero(row >= row[cand].min())
                    order = sorted(
                        cand.tolist(), key=lambda j: (-row[j], keys_l[j])
                    )[:kk]
                else:
                    order = cand[np.argsort(-sims[row_i, cand], kind="stable")]
                results.append([payloads_l[j] for j in order])
            pdf = pdf.copy()
            pdf[embed_col] = list(qm)
            pdf[output_col] = results
            yield pdf

    return query_df.mapInPandas(_fused, schema=out_schema)


def build_ivf_index(
    index_df: DataFrame,
    index_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    n_iter: int = 5,
    refine_iters: int = 0,
) -> tuple[DataFrame, list[list[float]]]:
    """Assign each index row a ``centroid_id`` via Lloyd's k-means on a
    driver-collected sample. Returns (index_df + centroid_id, centroids).

    ``refine_iters > 0`` additionally refines the sample-trained
    centroids over the FULL corpus with the exact-integer distributed
    Lloyd rounds (operators/clustering.py::lloyd_refine, seeded with the
    sample model) — at 100 TB the sample sees ~nlist·200 rows, so heavy
    tails the sample missed can skew cells; each refine round is one
    map-only assignment + one map-side-combinable (cid, pos) aggregate
    over the corpus. Default 0 keeps the sample-only model (pinned
    ann_ivf_topk behavior).

    Scale note: write the result partitioned by ``centroid_id``
    (``df.write.partitionBy('centroid_id')``) so probes prune partitions at
    the parquet-scan level instead of broadcasting the whole index.
    """
    # uniform sample, NOT limit(): limit takes whatever rows arrive first
    # (file order), so on sorted/clustered data the centroids collapse onto
    # one region and recall at nprobe < nlist silently degrades
    target = max(nlist * 200, 2000)
    n_total = index_df.count()
    if n_total > target:
        fraction = min(1.0, (target * 1.2) / n_total)
        sample = index_df.select(index_col).sample(False, fraction, seed=seed).collect()
    else:
        sample = index_df.select(index_col).collect()
    x = np.asarray([r[0] for r in sample], dtype=np.float32)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(n_iter):
        d = np.linalg.norm(x[:, None, :] - cent[None, :, :], axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            pts = x[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
    if refine_iters > 0:
        from flink_sql_ai_meetingcoach_azure_spark.operators.clustering import (  # noqa: PLC0415
            lloyd_refine,
        )

        micro_seeds = [
            [int(round(float(v) * 1_000_000)) for v in c] for c in cent
        ]
        tmp = index_df.select(
            F.monotonically_increasing_id().alias("__rid"),
            F.col(index_col).alias("embedding"),
        )
        _, refined = lloyd_refine(
            tmp, k=len(cent), iters=refine_iters, id_col="__rid",
            seeds=micro_seeds,
        )
        cent = np.asarray(
            [[v / 1e6 for v in c] for c in refined], dtype=np.float32
        )
    spark = index_df.sparkSession
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf("int")
    def _assign(s: pd.Series) -> pd.Series:
        c_l = bc.value
        m = np.asarray(list(s), dtype=np.float32)
        d = np.linalg.norm(m[:, None, :] - c_l[None, :, :], axis=2)
        return pd.Series(d.argmin(axis=1))

    return index_df.withColumn("centroid_id", _assign(F.col(index_col))), cent.tolist()


def _probe_udf(centroids: list[list[float]], nprobe: int, spark):
    """pandas UDF: query embedding → its ``nprobe`` nearest centroid ids."""
    cent = np.asarray(centroids, dtype=np.float32)
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf("array<int>")
    def _probes(s: pd.Series) -> pd.Series:
        c_l = bc.value
        m = np.asarray(list(s), dtype=np.float32)
        d = np.linalg.norm(m[:, None, :] - c_l[None, :, :], axis=2)
        npb = min(nprobe, d.shape[1])
        return pd.Series(list(np.argsort(d, axis=1)[:, :npb]))

    return _probes


def write_ivf_index(ivf_index_df: DataFrame, centroids: list[list[float]], path: str) -> None:
    """Persist an IVF index PARTITIONED BY centroid_id (one directory per
    cell) plus a centroids sidecar. This is the 100-TB shape the in-memory
    join approximates: probes become PARTITION FILTERS on the parquet scan,
    so only ~nprobe/nlist of the index is READ from storage, not
    scanned-and-filtered.

    The sidecar is written through the HADOOP FILESYSTEM API (one
    ``_centroids.json`` file beside the partition dirs) rather than a local
    ``open()`` so the index works on any Hadoop filesystem (hdfs://,
    s3a://, abfs://) — the deployments the partitioned layout exists for —
    without paying a Spark write job for an nlist-row file. The ``_``
    prefix keeps it invisible to ``spark.read.parquet(path)`` (Hadoop
    hidden-path filter)."""
    import json  # noqa: PLC0415

    spark = ivf_index_df.sparkSession
    # co-locate each cell before the partitioned write: without this every
    # input partition emits a file into every cell directory (partitions ×
    # nlist small files — slower to write and a small-file read penalty on
    # every probe thereafter); one hash shuffle on centroid_id yields one
    # file per cell at this scale (at 100 TB, add a second in-cell key to
    # repartition() to split giant cells across files)
    (
        ivf_index_df.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    jpath = spark._jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_centroids.json")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    out.write(bytearray(json.dumps(centroids).encode("utf-8")))
    out.close()


def read_ivf_centroids(spark, path: str) -> list[list[float]]:
    import json  # noqa: PLC0415

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/_centroids.json")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def ivf_pruned_scan(spark, path: str, cells: list[int]) -> DataFrame:
    """The probed cells as a partition-pruned parquet scan (explain shows
    ``PartitionFilters: [centroid_id IN (...)]`` — asserted in tests)."""
    return spark.read.parquet(path).filter(F.col("centroid_id").isin([int(c) for c in cells]))


def vector_search_ivf_parquet(
    query_df: DataFrame,
    path: str,
    k: int = 3,
    nprobe: int = 4,
    query_col: str = "embedding",
    index_col: str = "embedding",
    payload_cols: list[str] | None = None,
    output_col: str = "search_results",
    round_sim: int | None = None,
) -> DataFrame:
    """IVF probe against an on-disk partitioned index: one small job over
    the (query-side) stream collects the distinct probed cells, the index
    scan prunes to exactly those partitions, then the per-query probe join
    runs as in :func:`vector_search_ivf` — identical results, but storage
    reads scale with nprobe/nlist instead of the index size."""
    spark = query_df.sparkSession
    centroids = read_ivf_centroids(spark, path)
    probes = _probe_udf(centroids, nprobe, spark)
    cells = [
        r[0]
        for r in query_df.select(
            F.explode(probes(F.col(query_col))).alias("c")
        ).distinct().collect()
    ]
    idx = ivf_pruned_scan(spark, path, cells)
    return vector_search_ivf(
        query_df,
        idx,
        centroids,
        k=k,
        nprobe=nprobe,
        query_col=query_col,
        index_col=index_col,
        payload_cols=payload_cols,
        output_col=output_col,
        round_sim=round_sim,
    )


def vector_search_ivf(
    query_df: DataFrame,
    ivf_index_df: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 4,
    query_col: str = "embedding",
    index_col: str = "embedding",
    payload_cols: list[str] | None = None,
    output_col: str = "search_results",
    round_sim: int | None = None,
) -> DataFrame:
    """IVF probe: each query searches only its ``nprobe`` nearest centroid
    cells. Join on centroid_id prunes the candidate set to ~nprobe/nlist of
    the index before the exact top-k — the path that survives an index too
    large to broadcast."""
    payload_cols = payload_cols or [
        c for c in ivf_index_df.columns if c not in (index_col, "centroid_id")
    ]
    spark = query_df.sparkSession
    _probes = _probe_udf(centroids, nprobe, spark)

    import pyspark.sql.types as T  # noqa: PLC0415

    q0 = query_df.withColumn(_QID, F.monotonically_increasing_id())
    # Per-CELL GEMM top-k (optimization guide §4.2): the old form joined
    # every (query, candidate) pair as a JVM row and paid an interpreted
    # zip_with dot per pair plus a corpus-candidate-sized window sort.
    # Cogrouping query probes with the pruned index on centroid_id runs ONE
    # float64 GEMM per cell and emits only k candidates per (query, cell);
    # the global k-cut then sorts queries×nprobe×k rows instead of
    # queries×(index/nlist)×nprobe. The per-cell cut is LOSSLESS: it keeps
    # the top-k of each cell under the same (sim DESC, payload ASC) total
    # order the global cut uses, and the global top-k is contained in the
    # union of per-cell top-ks.
    qp = q0.select(_QID, query_col).withColumn(
        "centroid_id", F.explode(_probes(F.col(query_col)))
    )
    idx = ivf_index_df.select(
        "centroid_id", *payload_cols, F.col(index_col).alias("__index_vec")
    )
    pay_fields = [ivf_index_df.schema[c] for c in payload_cols]
    cell_schema = T.StructType(
        [T.StructField(_QID, T.LongType())]
        + pay_fields
        + [T.StructField("__sim", T.DoubleType())]
    )

    def _percell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({f.name: [] for f in cell_schema.fields})
        # presort the cell by the payload tuple ASC: a stable descending-sim
        # argsort over this order is exactly the (sim DESC, payload ASC)
        # ranking, ties included
        order = sorted(
            range(len(right)),
            key=lambda i: tuple(right.iloc[i][c] for c in payload_cols),
        )
        mat = np.asarray(list(right["__index_vec"].iloc[order]), dtype=np.float64)
        inorm = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        inorm[inorm == 0] = 1.0
        qm = np.asarray(list(left[query_col]), dtype=np.float64)
        qn = np.sqrt(np.einsum("ij,ij->i", qm, qm))
        qn[qn == 0] = 1.0
        sims = (qm @ mat.T) / (qn[:, None] * inorm[None, :])
        if round_sim is not None:
            sims = _round_half_away(sims, round_sim)
        kk = min(k, sims.shape[1])
        top = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        b = len(left)
        qrep = np.repeat(np.arange(b), kk)
        flat = top.ravel()
        out = {_QID: left[_QID].to_numpy()[qrep]}
        for c in payload_cols:
            out[c] = right[c].iloc[order].to_numpy()[flat]
        out["__sim"] = sims[qrep, flat]
        return pd.DataFrame(out)

    cell_hits = qp.groupBy("centroid_id").cogroup(
        idx.groupBy("centroid_id")
    ).applyInPandas(_percell, schema=cell_schema)
    # global exact k-cut over the per-cell winners: sort key (−sim, payload
    # ASC tuple) reproduces the old window's row_number ordering
    sort_struct = F.struct(
        (-F.col("__sim")).alias("ns"),
        *[F.col(c).alias(f"p{i}") for i, c in enumerate(payload_cols)],
        F.struct(*[F.col(c) for c in payload_cols]).alias("s"),
    )
    agg = cell_hits.groupBy(_QID).agg(
        F.slice(F.array_sort(F.collect_list(sort_struct)), 1, k).alias("__pairs")
    )
    results = agg.select(
        _QID, F.transform(F.col("__pairs"), lambda p: p["s"]).alias(output_col)
    )
    # left-join back onto the original query rows: a query whose nprobe
    # probed cells contain no index rows must still appear (with an empty
    # search_results array) — the operator appends a column to EVERY row
    empty = F.array().cast(
        T.ArrayType(T.StructType([ivf_index_df.schema[c] for c in payload_cols]))
    )
    return q0.join(results, on=_QID, how="left").select(
        *query_df.columns, F.coalesce(F.col(output_col), empty).alias(output_col)
    )
