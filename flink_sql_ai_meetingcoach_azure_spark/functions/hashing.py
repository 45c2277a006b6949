"""Hashing primitives shared by dedup / fingerprint / LSH operators.

All hashes are md5-derived so the arithmetic is reproducible bit-for-bit in
ANSI SQL (DuckDB oracle): Spark ``conv(substr(md5(x),1,15),16,10)`` equals
DuckDB ``('0x' || substr(md5(x),1,15))::bigint``. 15 hex digits = 60 bits,
always positive, no signed-overflow divergence between engines.

The reference's only hash use is md5-of-content dedup keys
(app/utils/kafka_utils.py:212-217); the MinHash/SimHash layers are the
beyond-reference training-data operators built on the same primitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 15  # 60-bit positive hash


def md5_bigint_col(c: Column | str, salt: str | None = None) -> Column:
    """Deterministic positive 60-bit BIGINT hash of a string column."""
    col = F.col(c) if isinstance(c, str) else c
    if salt is not None:
        col = F.concat(col, F.lit(":" + salt))
    return F.conv(F.substring(F.md5(col), 1, HEX_DIGITS), 16, 10).cast("bigint")


def md5_bigint_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB-SQL rendering of :func:`md5_bigint_col` for oracle parity."""
    e = f"({expr}) || ':{salt}'" if salt is not None else expr
    return f"('0x' || substr(md5({e}), 1, {HEX_DIGITS}))::bigint"


# --- affine MinHash family -------------------------------------------------
# One md5 per value, then h_i = (a_i·h + b_i) mod P — the classical MinHash
# permutation family. Base hash is 32 bits (8 hex digits) so a_i·h + b_i
# stays under 2^63 in both engines' signed BIGINT arithmetic.

MERSENNE_P = (1 << 31) - 1  # 2147483647, prime
AFFINE_A = [769, 8221, 98317, 196613, 393241, 786433, 1572869, 3145739]
AFFINE_B = [12289, 24593, 49157, 86243, 172933, 345007, 690163, 1381147]


def md5_int32_col(c: Column | str) -> Column:
    """Deterministic positive 32-bit hash (first 8 md5 hex digits)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def md5_int32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::bigint"


def affine_hash_col(h: Column, i: int) -> Column:
    """i-th permutation hash of a 32-bit base hash column."""
    return (h * F.lit(AFFINE_A[i]) + F.lit(AFFINE_B[i])) % F.lit(MERSENNE_P)


def affine_hash_sql(h_expr: str, i: int) -> str:
    return f"(({h_expr}) * {AFFINE_A[i]} + {AFFINE_B[i]}) % {MERSENNE_P}"
