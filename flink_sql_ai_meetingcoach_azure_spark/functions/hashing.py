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
