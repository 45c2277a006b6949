"""Vector math on ARRAY<FLOAT> columns — JVM-side, no Python workers.

Used by the vector-search operator (reference semantics: MongoDB Atlas
cosine ANN, terraform/main.tf:649-669). Higher-order functions
(``zip_with`` + ``aggregate``) keep the math in the JVM; the pandas/numpy
matrix path for large batches lives in operators/vector_search.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns (double result)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity, matching DuckDB ``list_cosine_similarity``."""
    return dot_col(a, b) / (norm_col(a) * norm_col(b))
