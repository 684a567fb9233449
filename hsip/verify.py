"""V1-V5 — candidate-pair verification (reference "matching" stage at scale).

Hydration (V1) is the classic double big-table equi-join: pairs joined to
the feature table on a, then on b — sort-merge joins with AQE skew split.
Checks are pure SQL where possible:
  V2 exact Jaccard  : size(array_intersect)/size(array_union)  (codegen'd)
  V3 Hamming        : bit_count(simhash_a ^ simhash_b) <= d     (codegen'd)
  V4 substring      : window-equality re-check (see suffixes.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DedupConfig


def hydrate(pairs: DataFrame, features: DataFrame, cols: list[str]) -> DataFrame:
    """V1: attach feature columns for both pair sides as <col>_a / <col>_b.

    Both joins scan the SAME projected feature subplan and only rename
    columns AFTER each join: the two feature-side exchanges canonicalize
    identically, so ReuseExchange ships the fat feature columns through
    the shuffle ONCE instead of twice (event-log measured on the 554k-turn
    corpus: 2x478 MB of shuffled shingle arrays collapsed to one — the
    single largest multi-executor CPU cost in the verify phase)."""
    f = features.select("id", *cols)
    out = pairs.join(f, pairs["a"] == f["id"]).drop("id")
    for c in cols:
        out = out.withColumnRenamed(c, f"{c}_a")
    fb = f.alias("fb")
    out = out.join(fb, out["b"] == fb["id"]).drop("id")
    for c in cols:
        out = out.withColumnRenamed(c, f"{c}_b")
    return out


def jaccard_col() -> F.Column:
    inter = F.size(F.array_intersect("shingles_a", "shingles_b"))
    union = F.size(F.array_union("shingles_a", "shingles_b"))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verify_jaccard(pairs: DataFrame, shingles_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """V2: exact Jaccard over shingle sets; keeps score for reporting."""
    h = hydrate(pairs, shingles_df, ["shingles"])
    return (
        h.withColumn("jaccard", jaccard_col())
        .drop("shingles_a", "shingles_b")
        .withColumn("verdict", F.col("jaccard") >= cfg.jaccard_threshold)
    )


def verify_hamming(pairs: DataFrame, simhash_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """V3: bit_count(xor) <= d over 64-bit SimHash fingerprints."""
    h = hydrate(pairs, simhash_df, ["simhash"])
    return (
        h.withColumn(
            "hamming",
            F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))).cast("int"),
        )
        .drop("simhash_a", "simhash_b")
        .withColumn("verdict", F.col("hamming") <= cfg.hamming_d)
    )


def verify_jaccard_hamming(pairs: DataFrame, features: DataFrame,
                           cfg: DedupConfig) -> DataFrame:
    """V2+V3 fused: verify a MIXED candidate table (channel column says
    which check applies) against ONE canonical feature subplan.

    Why fused: hydrating the minhash and simhash channels separately
    ships two feature-side exchanges (one fat with shingle arrays, one
    thin) and runs two short join chains whose straggler waves serialize.
    Here both channels' pairs hydrate (shingles, simhash) through the
    SAME projected subplan — ReuseExchange ships the feature table once —
    and each row evaluates only its own channel's predicate (the CASE
    keeps array_intersect off simhash rows). Halves the verify-phase
    stage count at any executor count (VERDICT.md r2 item 1).
    """
    h = hydrate(pairs, features, ["shingles", "simhash"])
    is_mh = F.col("channel") == "minhash_lsh"
    jac = F.when(is_mh, jaccard_col())
    ham = F.when(
        ~is_mh,
        F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))).cast("int"),
    )
    return (
        h.withColumn("jaccard", jac)
        .withColumn("hamming", ham)
        .drop("shingles_a", "shingles_b", "simhash_a", "simhash_b")
        .withColumn(
            "verdict",
            F.when(is_mh, F.col("jaccard") >= cfg.jaccard_threshold)
            .otherwise(F.col("hamming") <= cfg.hamming_d),
        )
    )


def combine_verified(*verified: DataFrame) -> DataFrame:
    """V5: union per-channel verdicts into one edge list with provenance."""
    normed = []
    for df in verified:
        base = df.select(
            "a", "b", "channel", "verdict",
            *(c for c in ("jaccard", "hamming", "substr_len") if c in df.columns),
        )
        for c in ("jaccard", "hamming", "substr_len"):
            if c not in base.columns:
                base = base.withColumn(
                    c, F.lit(None).cast("double" if c == "jaccard" else "int")
                )
        normed.append(base)
    allv = normed[0]
    for df in normed[1:]:
        allv = allv.unionByName(df)
    return allv.groupBy("a", "b").agg(
        F.max("jaccard").alias("jaccard"),
        F.min("hamming").alias("hamming"),
        F.max("substr_len").alias("substr_len"),
        F.collect_set(F.when(F.col("verdict"), F.col("channel"))).alias("channels"),
        F.max(F.col("verdict").cast("int")).cast("boolean").alias("verdict"),
    )


def edges(verified: DataFrame) -> DataFrame:
    return verified.filter("verdict").select("a", "b")
