"""Nearest-centroid embedding clustering + cluster-balanced sampling.

Beyond-reference curation operators: semantic clustering is the backbone
of cluster-based data curation (SemDeDup, DiverseSample): assign every
embedding to its nearest centroid, then draw a *balanced*, deterministic
per-cluster sample so dominant semantic modes don't swamp the training
mix. The iterative k-means that *produces* centroids already exists in
the IVF index build (vector_search.py::_kmeans); this module is the
assignment + sampling half that runs at corpus scale, with any centroid
set (trained, seeded, or externally supplied).

Scale design (100 TB embeddings, k ≤ ~1e5 centroids):

- centroids are broadcast; the corpus side is never shuffled for the
  assignment itself — the cross join is a broadcast nested loop whose
  output is immediately collapsed by a map-side-combinable ``min`` agg
  (k rows in, 1 row out per embedding before the exchange);
- the per-cluster sample ranks by a salted md5 of the id — retry-stable
  and engine-reproducible (operators/sampling.py contract) — one window
  partitioned by cluster, skew-bounded because cluster sizes are capped
  by the sample quota anyway (at extreme skew, pre-filter with
  deterministic_sample at rate ≈ quota/cluster_size first);
- similarity is cosine rounded to 6 dp with centroid-id ASC tie-break
  (queries.py determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.functions.hashing import md5_bigint_col
from flink_sql_ai_meetingcoach_azure_spark.functions.vectors import cosine_similarity_col


def assign_nearest_centroid(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """(id, cluster_id, sim): nearest centroid by cosine, 6-dp rounded,
    centroid-id ASC tie-break.

    The argmax is one combinable ``min(struct(-sim, cid))`` aggregate —
    partial aggregation collapses the k-way blowup map-side, so the
    exchange carries ~one row per embedding.
    """
    pairs = embeddings.select(
        F.col(id_col), F.col(vec_col)
    ).crossJoin(
        F.broadcast(
            centroids.select(
                F.col(centroid_id_col).alias("_cid"),
                F.col(centroid_vec_col).alias("_cvec"),
            )
        )
    ).withColumn(
        "_sim", F.round(cosine_similarity_col(vec_col, "_cvec"), 6)
    )
    best = (
        pairs.groupBy(id_col)
        .agg(F.min(F.struct((-F.col("_sim")).alias("ns"), F.col("_cid").alias("cid"))).alias("m"))
        .select(
            id_col,
            F.col("m.cid").alias("cluster_id"),
            (-F.col("m.ns")).alias("sim"),
        )
    )
    return best


def cluster_balanced_sample(
    assigned: DataFrame,
    per_cluster: int,
    id_col: str = "vec_id",
    cluster_col: str = "cluster_id",
    salt: str = "csample",
) -> DataFrame:
    """Keep a deterministic ``per_cluster``-row sample of each cluster,
    ranked by salted md5 of the id (retry-stable, engine-reproducible)."""
    w = Window.partitionBy(cluster_col).orderBy(
        md5_bigint_col(F.col(id_col).cast("string"), salt), F.col(id_col)
    )
    return (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_cluster)
        .drop("_rn")
    )
