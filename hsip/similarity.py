"""Similarity search over embedding columns (array<float>).

Two paths:
  brute_force_topk — exact cosine top-k via broadcast probes + window
                     rank; the correctness baseline. O(N*Q).
  rhp_lsh_topk     — random-hyperplane LSH (Charikar STOC'02 for cosine):
                     b-bit sign signatures, banded into buckets; exact
                     cosine re-rank within candidate buckets. Sub-linear
                     candidate volume — the 100 TB path, where a
                     brute-force cross join is impossible.

Hyperplanes are seeded -> deterministic across runs/partitions. The dot
products run JVM-side via higher-order functions when ranking candidate
pairs (no Python in the verify loop); signatures use one numpy pandas UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " 0D, (acc, v) -> acc + v)"
)


def _cosine_expr(a: str, b: str) -> F.Column:
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return dot / F.when(na * nb > 0, na * nb).otherwise(F.lit(1.0))


def brute_force_topk(emb: DataFrame, probes: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k: probes broadcast against the full table."""
    p = probes.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q")
    )
    scored = (
        F.broadcast(p)
        .crossJoin(emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("v")))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", _cosine_expr("q", "v").alias("cos"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("n_id").alias("neighbor_id"), F.round("cos", 6).alias("cos"), "rk")
    )


def rhp_signatures(emb: DataFrame, dim: int, n_bits: int = 64, seed: int = 42,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-of-projection signatures: bit j = (v . h_j) >= 0 (Charikar'02).
    P[bits agree] = 1 - angle/pi — Hamming distance estimates cosine."""

    @pandas_udf(T.LongType())
    def sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        gen = np.random.default_rng(seed)
        planes = gen.standard_normal((dim, n_bits))
        shifts = np.arange(n_bits, dtype=np.uint64)
        for vecs in it:
            if len(vecs) == 0:
                yield pd.Series([], dtype=np.int64)
                continue
            m = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
            bits = (m @ planes) >= 0  # (rows, n_bits)
            packed = (bits.astype(np.uint64) << shifts[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.Series(packed.view(np.int64))

    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig(F.col(vec_col)).alias("sig")
    )


def rhp_lsh_topk(emb: DataFrame, k: int, dim: int, n_bits: int = 64,
                 band_bits: int = 8, seed: int = 42, bucket_cap: int = 512,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 recorder=None, hot_policy: str = "star",
                 scratch: list | None = None) -> DataFrame:
    """Approximate top-k: band the sign signature into n_bits/band_bits
    bucket keys, exact-cosine re-rank within buckets.

    Scale shape (VERDICT.md r1 findings 1+2 fixed here):
      - only (id, band_id, band_key) crosses the bucket shuffle — the
        float vectors are hydrated AFTER pair generation via two equi-
        joins (the verify.py V1 pattern), not carried once per band;
      - bucket pairing routes through lsh.pairs_from_buckets, so hot
        buckets get the star/salt policy instead of being silently
        dropped (a query landing only in degenerate buckets still gets
        neighbors), and truncations land in the metrics table when a
        ``recorder`` (hsip.metrics.Recorder) is passed — no silent caps.
    """
    from .lsh import pairs_from_buckets

    sigs = rhp_signatures(emb, dim, n_bits, seed, id_col, vec_col).cache()
    n_bands = n_bits // band_bits
    mask = (1 << band_bits) - 1
    band_arr = F.array(
        *[
            F.shiftright(F.col("sig"), i * band_bits).bitwiseAND(F.lit(mask))
            for i in range(n_bands)
        ]
    )
    # keys only through the shuffle; cached per the pairs_from_buckets
    # contract (sizes-groupBy and join-back both scan it)
    bands = (
        sigs.select("id", F.posexplode(band_arr).alias("band_id", "band_key"))
        .repartition("band_id", "band_key")
        .cache()
    )
    bands.count()
    if scratch is not None:
        # caller releases both once the top-k result has materialized
        # (VERDICT.md r3 item 5)
        scratch.extend([sigs, bands])
    pairs, hot_stats = pairs_from_buckets(
        bands, bucket_cap, bucket_cols=("band_id", "band_key"),
        channel="rhp_lsh", hot_policy=hot_policy, salt_seed=seed,
    )
    if recorder is not None:
        recorder.metric("rhp_lsh_topk", "hot_buckets", hot_stats.count())

    # each undirected candidate serves both query directions
    directed = pairs.select(
        F.col("a").alias("q_id"), F.col("b").alias("n_id")
    ).unionByName(pairs.select(F.col("b").alias("q_id"), F.col("a").alias("n_id")))
    vecs = sigs.select("id", "v")
    hydrated = directed.join(
        vecs.select(F.col("id").alias("q_id"), F.col("v").alias("q")), "q_id"
    ).join(vecs.select(F.col("id").alias("n_id"), F.col("v").alias("v")), "n_id")
    scored = hydrated.select("q_id", "n_id", _cosine_expr("q", "v").alias("cos"))
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("n_id").alias("neighbor_id"), F.round("cos", 6).alias("cos"), "rk")
    )
