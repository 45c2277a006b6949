"""Edit-distance similarity join — partition-based (PassJoin-style).

Distributed form of the partition-based edit-distance similarity join
(Li, Deng, Feng, "PASS-JOIN: A Partition-based Method for Similarity
Joins", PVLDB 5(3), 2011 — public paper): every indexed string is cut
into ``d+1`` contiguous segments; by pigeonhole, two strings within edit
distance ``d`` share at least one segment that survives the optimal
alignment error-free, and (because position drift under ``<= d`` edits is
at most ``d``) that segment's image in the other string starts within
``±d`` of its source position.  Candidates therefore come from an
EQUI-join on ``(target_length, segment_index, segment_text)`` — never
the n² pair space — and each candidate is verified with one bounded
``levenshtein`` call (threshold-limited, so verification cost is
O(d·min_len) per candidate, not O(len²)).

This is the fuzzy complement to the hash-based near-dup family in
``operators/dedup.py``: MinHash/SimHash catch token-level overlap;
edit distance catches character-level variants (typos, near-identical
titles/ids) with an EXACT threshold semantics the oracle can replay as
a brute-force ``levenshtein`` join.

Scale design: the index side emits exactly ``d+1`` rows per string; the
probe side at most ``(2d+1)·(d+1)·(2d+1)`` keys per string (45 at d=2,
far fewer after the position/length-window intersection) — both linear
in corpus size. Join keys ``(length, segment_index, substring)`` are
hash-distributed; the one skew risk is a hot shared segment (boilerplate
titles) — the same mode as the n-gram shingle join and cappable the same
way upstream (dedup exact duplicates first; they would pair quadratically
under ANY within-threshold join, including the oracle's). Strings short
enough to make segments degenerate (``len <= 3d``) take a separate
DISTINCT-VALUE brute-force leg: the domain of such short strings is
alphabet-bounded (|Σ|^3d), so its pair space is tiny regardless of corpus
row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _segment_bounds(tl: Column, gi: Column, k: int) -> tuple[Column, Column]:
    """0-based start and length of segment ``gi`` of ``k`` for a string of
    length ``tl`` (even scheme: the first ``k - (tl % k)`` segments get
    ``floor(tl/k)`` chars, the rest one more). ``gi`` is a COLUMN so one
    expression serves every exploded (segment, shift) combination — the
    expression tree stays constant-size in ``max_dist`` (a per-combination
    ``when``-struct formulation grew as (2d+1)²(d+1) and stalled the
    optimizer outright at d=3)."""
    base = F.floor(tl / F.lit(k)).cast("int")
    rem = (tl % F.lit(k)).cast("int")
    l_i = base + F.when(gi >= F.lit(k) - rem, F.lit(1)).otherwise(F.lit(0))
    p_i = gi * base + F.greatest(F.lit(0), gi - (F.lit(k) - rem))
    return p_i.cast("int"), l_i.cast("int")


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All unordered pairs ``(id_a < id_b)`` whose ``text_col`` values are
    within ``max_dist`` edits (unit-cost insert/delete/substitute),
    with the exact distance — PassJoin candidate generation + bounded
    levenshtein verify. Exact recall (no approximation): equal by
    construction to the brute-force ``levenshtein(a,b) <= d`` join.
    """
    d = max_dist
    k = d + 1
    short_max = 3 * d  # below this, segments degenerate -> brute-force leg

    s = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.length(text_col).cast("int").alias("m"),
    ).filter(F.col("s").isNotNull())

    # ---- long leg: PassJoin equi-join on (target_len, seg_idx, seg) ----
    # index side: every string longer than short_max emits its d+1 segments.
    # The exploded array holds only LITERAL segment indices; substring
    # bounds are one shared expression of (m, gi).
    gi_col = F.col("gi").cast("int")
    ip, il = _segment_bounds(F.col("m"), gi_col, k)
    idx = (
        s.filter(F.col("m") > short_max)
        .select(
            F.col("id").alias("id_s"),
            F.col("s").alias("s_s"),
            F.col("m").alias("tl"),
            "m",
            F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("gi"),
        )
        .select(
            "id_s",
            "s_s",
            "tl",
            "gi",
            F.col("s_s").substr(ip + F.lit(1), il).alias("seg"),
        )
    )

    # probe side: for each target length within ±d (and > short_max), each
    # segment of THAT length's scheme may appear shifted by at most ±d.
    # Explode the tiny literal (off, gi, shift) combo set, then evaluate a
    # single parameterized (tl, pos, len) expression per row.
    combos = F.array(
        *[
            F.struct(
                F.lit(off).alias("off"), F.lit(i).alias("gi"), F.lit(sh).alias("sh")
            )
            for off in range(-d, d + 1)
            for i in range(k)
            for sh in range(-d, d + 1)
        ]
    )
    tl = (F.col("m") + F.col("c.off")).cast("int")
    pp, pl = _segment_bounds(tl, F.col("c.gi").cast("int"), k)
    pos = (pp + F.col("c.sh")).cast("int")
    probe = (
        s.select(
            F.col("id").alias("id_r"),
            F.col("s").alias("s_r"),
            "m",
            F.explode(combos).alias("c"),
        )
        .select(
            "id_r",
            "s_r",
            "m",
            tl.alias("tl"),
            F.col("c.gi").alias("gi"),
            pos.alias("pos"),
            pl.alias("sl"),
        )
        .filter(
            (F.col("tl") > F.lit(short_max))
            & (F.col("pos") >= F.lit(0))
            & (F.col("pos") + F.col("sl") <= F.col("m"))
        )
        .select(
            "id_r",
            "s_r",
            "tl",
            "gi",
            F.col("s_r").substr(F.col("pos") + F.lit(1), F.col("sl")).alias("seg"),
        )
        .distinct()  # several (off, shift) combos can yield the same key
    )

    long_cand = (
        probe.join(idx, on=["tl", "gi", "seg"])
        .filter(F.col("id_r") != F.col("id_s"))
        .select(
            F.when(
                F.col("id_r") < F.col("id_s"),
                F.struct(
                    F.col("id_r").alias("id_a"),
                    F.col("s_r").alias("s_a"),
                    F.col("id_s").alias("id_b"),
                    F.col("s_s").alias("s_b"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("id_s").alias("id_a"),
                    F.col("s_s").alias("s_a"),
                    F.col("id_r").alias("id_b"),
                    F.col("s_r").alias("s_b"),
                )
            )
            .alias("pr")
        )
        .select("pr.id_a", "pr.s_a", "pr.id_b", "pr.s_b")
        .distinct()
    )

    # ---- short leg: both sides <= short_max chars. Join DISTINCT values
    # (alphabet-bounded domain) then fan back out to ids.
    shorts = s.filter(F.col("m") <= short_max)
    vals = shorts.select("s").distinct()
    va = vals.select(F.col("s").alias("s_a"))
    vb = vals.select(F.col("s").alias("s_b"))
    vpairs = va.join(
        vb,
        (F.col("s_a") <= F.col("s_b"))
        & (
            F.abs(F.length("s_a") - F.length("s_b")) <= F.lit(d)
        ),
    ).filter(F.levenshtein("s_a", "s_b") <= F.lit(d))
    ids_a = shorts.select(F.col("id").alias("raw_a"), F.col("s").alias("s_a"))
    ids_b = shorts.select(F.col("id").alias("raw_b"), F.col("s").alias("s_b"))
    short_cand = (
        vpairs.join(ids_a, on="s_a")
        .join(ids_b, on="s_b")
        .filter(F.col("raw_a") != F.col("raw_b"))
        .select(
            F.least("raw_a", "raw_b").alias("id_a"),
            F.when(F.col("raw_a") < F.col("raw_b"), F.col("s_a"))
            .otherwise(F.col("s_b"))
            .alias("s_a"),
            F.greatest("raw_a", "raw_b").alias("id_b"),
            F.when(F.col("raw_a") < F.col("raw_b"), F.col("s_b"))
            .otherwise(F.col("s_a"))
            .alias("s_b"),
        )
        .distinct()
    )

    cand = long_cand.unionByName(short_cand)
    dist = F.levenshtein("s_a", "s_b", d)  # threshold: -1 past d
    return (
        cand.withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= F.lit(d)))
        .select("id_a", "id_b", "dist")
    )
