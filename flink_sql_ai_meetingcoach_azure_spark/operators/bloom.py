"""Bloom-filter runtime pre-filter for selective big⋈small joins.

At 100 TB the dominant cost of ``fact ⋈ selective_dim`` is shuffling the
fact side: every fact row rides the exchange even though only a sliver
survives the join. Spark's own runtime filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) inject this
rewrite automatically for some plan shapes; this module is the explicit,
engine-level form — usable on any DataFrame pair, with a bounded,
inspectable bitmap — the same reduce-the-probe-exchange idea Flink's
runtime filter applies on the reference's managed service (the reference
exposes no engine internals; its join forms are the
`terraform/generate_personalized_commands.sh` statements).

Mechanics
---------
1. Build: hash each build-side key ``k_hashes`` times (`xxhash64`, JVM
   whole-stage codegen) into a ``bits``-wide bit space; OR the bits into
   64-bit words with a ``bit_or`` hash aggregate (map-side combinable —
   at most ``bits/64`` rows per partition reach the exchange, regardless
   of build-side cardinality).
2. The dense word array (``bits/64`` BIGINTs, ~16 KB at the default
   2^17 bits) is collected (bounded by the group-key domain, not by
   data) and attached to the probe side as a one-row broadcast scalar —
   the repo's established crossJoin-scalar pattern.
3. Probe: keep rows whose ``k_hashes`` bit positions are all set — pure
   Catalyst expressions (`element_at` + `shiftleft` + bitwise AND), so
   the pre-filter runs inside whole-stage codegen BEFORE the join
   exchange.
4. The real join runs after the pre-filter. Bloom false positives are
   eliminated there, so the composed result is EXACTLY the plain join —
   which is what the DuckDB oracle checks. No false negatives: a key on
   the build side always has all its bits set.

Sizing: FP rate ≈ (1 - e^(-k·n/m))^k; the 2^17-bit default holds ~9 K
build keys at k=4 under 1 % FP. At cluster scale raise ``bits`` (2^24
bits is still a 2 MB driver-side bitmap) — the win is
(1 - join selectivity) of the fact-side exchange either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 17  # 131072 bits -> 2048 x 64-bit words (~16 KB)
BLOOM_K = 4
_SEEDS = [0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1]


def _positions(key: Column, bits: int, k_hashes: int) -> list[Column]:
    """k bit positions for a key column (xxhash64 with distinct seeds)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEEDS[i % len(_SEEDS)] + i)), F.lit(bits))
        for i in range(k_hashes)
    ]


def bloom_words(
    build: DataFrame,
    key: str,
    bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_K,
) -> list[int]:
    """Dense 64-bit-word bitmap of the build side's key set.

    One ``bit_or`` hash aggregate keyed by word index: partials OR bits
    map-side, so the exchange and the driver collect are both bounded at
    ``bits/64`` rows by construction — build-side cardinality never
    rides the shuffle."""
    pos = F.explode(F.array(*_positions(F.col(key), bits, k_hashes))).alias("pos")
    words = (
        build.select(pos)
        .groupBy((F.col("pos") / 64).cast("int").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
            ).alias("bits")
        )
        .collect()
    )
    dense = [0] * (bits // 64)
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_filter_probe(
    probe: DataFrame,
    key: str,
    words: list[int],
    bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_K,
) -> DataFrame:
    """Rows of ``probe`` whose key MAY be in the bloom (no false negatives).

    The bitmap rides in as a one-row broadcast scalar; each membership
    test is ``element_at(bloom, pos/64) & (1 << pos%64)`` — SQL
    ``shiftleft`` accepts a column shift amount (the pyspark wrapper
    does not), hence the expr() forms. All codegen'd, no Python."""
    spark = probe.sparkSession
    bmp = spark.createDataFrame([(words,)], "__bloom array<bigint>")
    out = probe.crossJoin(F.broadcast(bmp))
    test = F.lit(True)
    for i, p in enumerate(_positions(F.col(key), bits, k_hashes)):
        out = out.withColumn(f"__bp{i}", p)
        test = test & (
            F.expr(
                f"element_at(__bloom, CAST(__bp{i} / 64 AS INT) + 1) & "
                f"shiftleft(CAST(1 AS BIGINT), CAST(__bp{i} % 64 AS INT))"
            )
            != 0
        )
    drop = ["__bloom"] + [f"__bp{i}" for i in range(k_hashes)]
    return out.filter(test).drop(*drop)


def bloom_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_K,
    how: str = "inner",
) -> DataFrame:
    """``probe ⋈ build`` with a bloom pre-filter on the probe side.

    Result is EXACTLY ``probe.join(build, on, how)`` — the trailing real
    join removes bloom false positives and the bloom admits every true
    key. The payoff is the probe-side exchange carrying only the
    pre-filter survivors."""
    words = bloom_words(build, on, bits, k_hashes)
    pre = bloom_filter_probe(probe, on, words, bits, k_hashes)
    return pre.join(build, on, how)
