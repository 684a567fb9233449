"""X4 — pair-level recall/precision evaluator (BASELINE.json:2
"dup-pair recall >= 0.99 vs reference clusters").

Pairs are derived from cluster tables by within-cluster self-join, so the
metric is invariant to cluster labeling. Intersection via left_semi,
misses via left_anti (kept as a DataFrame for debugging which planted
duplicates a config missed).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_pairs(clusters: DataFrame, id_col: str = "id",
                  cluster_col: str = "cluster_id") -> DataFrame:
    """All unordered within-cluster pairs (a < b)."""
    d = clusters.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("c"))
    x, y = d.alias("x"), d.alias("y")
    return x.join(
        y, (F.col("x.c") == F.col("y.c")) & (F.col("x.id") < F.col("y.id"))
    ).select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))


@dataclass
class PairEval:
    n_truth: int
    n_ours: int
    n_hit: int

    @property
    def recall(self) -> float:
        return self.n_hit / self.n_truth if self.n_truth else 1.0

    @property
    def precision(self) -> float:
        return self.n_hit / self.n_ours if self.n_ours else 1.0


def evaluate_pairs(ours: DataFrame, truth: DataFrame) -> tuple[PairEval, DataFrame]:
    """ours/truth: pair tables (a,b) with a<b. Returns (metrics, missed)."""
    hit = truth.join(ours, ["a", "b"], "left_semi")
    missed = truth.join(ours, ["a", "b"], "left_anti")
    ev = PairEval(
        n_truth=truth.count(), n_ours=ours.count(), n_hit=hit.count()
    )
    return ev, missed
