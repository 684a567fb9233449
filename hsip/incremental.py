"""Incremental dedup: match NEW conversations against a persisted corpus
index without recomputing the corpus (SURVEY.md §2.9 batch analogue —
"join new convs' band table against persisted band index").

At 10^12 turns the full pipeline is a backfill; day-to-day operation is
appending a delta. The index is the features table (id, shingles, sig,
simhash) plus its derived band table persisted through the Catalog. For
a delta D against corpus C, candidates are (D x D) ∪ (D x C) — never
(C x C) — so the cost is O(|D| + matching buckets), not O(|C|).

New-vs-old bucket pairing is an equi-join of the delta's bucket keys
against the indexed bucket table: Catalyst broadcast-joins the delta
side when small, and only index partitions holding matching keys are
read when the index is stored bucketed/partitioned by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import verify as V
from .config import DedupConfig
from .lsh import band_table
from .textkernel import featurize


def build_index(docs: DataFrame, id_col: str, text_col: str, cfg: DedupConfig) -> dict[str, DataFrame]:
    """Features + band table for persisting via Catalog.write."""
    feats = featurize(docs, id_col, text_col, cfg)
    bands = band_table(feats.select("id", "sig"), cfg)
    return {"features": feats, "bands": bands}


def incremental_candidates(
    new_feats: DataFrame, index_bands: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Candidate pairs touching at least one NEW document.

    Returns (a, b, channel) with the new doc on at least one side;
    a < b canonical ordering. Bucket caps apply to the join fan-out via
    per-bucket limits on the index side.
    """
    new_bands = band_table(new_feats.select("id", "sig"), cfg).cache()

    # new x new within the delta
    x, y = new_bands.alias("x"), new_bands.alias("y")
    nn = x.join(
        y,
        (F.col("x.band_id") == F.col("y.band_id"))
        & (F.col("x.band_hash") == F.col("y.band_hash"))
        & (F.col("x.id") < F.col("y.id")),
    ).select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))

    # new x indexed corpus: equi-join on bucket key; cap index-side rows
    # per bucket so a boilerplate band cannot explode the join
    idx = (
        index_bands.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("band_id", "band_hash").orderBy("id")
            ),
        )
        .filter(F.col("rn") <= cfg.bucket_cap)
        .drop("rn")
    )
    no = new_bands.alias("n").join(
        idx.alias("o"),
        (F.col("n.band_id") == F.col("o.band_id"))
        & (F.col("n.band_hash") == F.col("o.band_hash"))
        & (F.col("n.id") != F.col("o.id")),
    ).select(
        F.least("n.id", "o.id").alias("a"), F.greatest("n.id", "o.id").alias("b")
    )

    return (
        nn.unionByName(no)
        .dropDuplicates(["a", "b"])
        .withColumn("channel", F.lit("minhash_lsh"))
    )


def incremental_verified_pairs(
    new_docs: DataFrame,
    id_col: str,
    text_col: str,
    index_features: DataFrame,
    index_bands: DataFrame,
    cfg: DedupConfig,
    new_feats: DataFrame | None = None,
) -> DataFrame:
    """Full incremental slice: featurize the delta, generate delta-touching
    candidates, verify exact Jaccard against the union feature table.
    Pass ``new_feats`` when the caller already featurized the delta."""
    if new_feats is None:
        new_feats = featurize(new_docs, id_col, text_col, cfg).cache()
    pairs = incremental_candidates(new_feats, index_bands, cfg)
    all_shingles = new_feats.select("id", "shingles").unionByName(
        index_features.select("id", "shingles")
    ).dropDuplicates(["id"])
    return V.verify_jaccard(pairs, all_shingles, cfg)
