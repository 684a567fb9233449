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


def bcubed_scores(pred: DataFrame, truth: DataFrame,
                  id_col: str = "id",
                  cluster_col: str = "cluster_id") -> DataFrame:
    """B-cubed extrinsic cluster evaluation (Bagga & Baldwin '98; the
    standard complement to pair recall for dedup clusterings — pair
    metrics over-weight large clusters quadratically, B-cubed weights
    every ITEM equally):

        precision_i = |P(i) ∩ T(i)| / |P(i)|,  recall_i = ... / |T(i)|

    averaged over items i shared by both tables (P/T = the item's
    predicted/truth cluster). Returns ONE row: (n_items,
    bcubed_precision, bcubed_recall, bcubed_f1); empty intersection
    scores 1.0/1.0 by the same vacuous-truth convention as PairEval.
    Items whose label is NULL in EITHER table are excluded from the
    intersection (partial ground truth), and n_items reports the
    post-exclusion count — the same rule adjusted_rand applies, so the
    two metrics always agree on the evaluated item set.

    Scale shape: never materializes within-cluster pairs (the pair
    tables cluster_pairs builds are quadratic in cluster size — exactly
    what this metric exists to avoid). One inner join on item id, one
    map-side-combining count per (pred, truth) cluster cell, two narrow
    size joins keyed by cluster id, one global 3-double reduction:
    Σ_cells ov²/|P| and Σ_cells ov²/|T| are the exact item sums because
    every item in a cell contributes ov/|P| and ov/|T|.
    """
    cells = _label_cells(pred, truth, id_col, cluster_col)
    psize = cells.groupBy("pc").agg(F.sum("ov").alias("psz"))
    tsize = cells.groupBy("tc").agg(F.sum("ov").alias("tsz"))
    tot = (
        cells.join(psize, "pc").join(tsize, "tc").agg(
            F.sum("ov").alias("n"),
            F.sum(F.col("ov") * F.col("ov") / F.col("psz")).alias("psum"),
            F.sum(F.col("ov") * F.col("ov") / F.col("tsz")).alias("rsum"),
        )
    )
    n, ps, rs = F.col("n"), F.col("psum"), F.col("rsum")
    return tot.select(
        F.coalesce(n, F.lit(0)).cast("long").alias("n_items"),
        F.round(F.coalesce(ps / n, F.lit(1.0)), 6).alias("bcubed_precision"),
        F.round(F.coalesce(rs / n, F.lit(1.0)), 6).alias("bcubed_recall"),
        F.round(
            F.coalesce(F.lit(2.0) * ps * rs / (n * (ps + rs)), F.lit(1.0)), 6
        ).alias("bcubed_f1"),
    )


def _label_cells(pred: DataFrame, truth: DataFrame,
                 id_col: str, cluster_col: str) -> DataFrame:
    """Contingency cells (pc, tc, ov) over items labeled non-NULL in
    BOTH tables — the shared item-set rule of bcubed_scores and
    adjusted_rand (NULL = unlabeled, excluded; without the explicit
    filter the two metrics would diverge silently: equi-joins on cell
    keys drop NULLs while groupBy keeps them as a pseudo-cluster)."""
    p = pred.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("pc"))
    t = truth.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("tc"))
    return (
        p.filter(F.col("pc").isNotNull())
        .join(t.filter(F.col("tc").isNotNull()), "id")
        .groupBy("pc", "tc")
        .agg(F.count(F.lit(1)).alias("ov"))
    )


def adjusted_rand(pred: DataFrame, truth: DataFrame,
                  id_col: str = "id",
                  cluster_col: str = "cluster_id") -> DataFrame:
    """Adjusted Rand Index (Hubert & Arabie '85) between a predicted and
    a truth clustering — the chance-corrected pair-agreement metric,
    B-cubed's standard companion: ~0 for independent clusterings, 1 for
    identical ones, computed from the contingency cells alone:

        ARI = (Σ C(ov,2) − E) / (½(Σ C(|P|,2) + Σ C(|T|,2)) − E),
        E   = Σ C(|P|,2) · Σ C(|T|,2) / C(n,2)

    Returns ONE row (n_items, ari); the degenerate zero-denominator
    cases (both clusterings all-singleton or all-one-cluster) score 1.0
    by the sklearn convention. NULL labels in either table exclude the
    item, exactly as in bcubed_scores (shared _label_cells rule). Same scale shape as bcubed_scores: one
    id join, per-cell counts, three 1-row aggregates cross-joined —
    within-cluster pairs are never materialized. Pair counts are exact
    in int64 through the per-cluster C(s,2) sums; the final products
    run in float64 (C(n,2) itself overflows int64 past ~4.3e9 items,
    where a metric is a diagnostic, not a hash target).
    """
    cells = _label_cells(pred, truth, id_col, cluster_col)

    def _pairs(c: F.Column) -> F.Column:
        return F.sum((c * (c - F.lit(1))).cast("double") / F.lit(2.0))

    idx = cells.agg(
        F.coalesce(F.sum("ov"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(_pairs(F.col("ov")), F.lit(0.0)).alias("idx"),
    )
    pp = cells.groupBy("pc").agg(F.sum("ov").alias("s")).agg(
        F.coalesce(_pairs(F.col("s")), F.lit(0.0)).alias("pp")
    )
    tt = cells.groupBy("tc").agg(F.sum("ov").alias("s")).agg(
        F.coalesce(_pairs(F.col("s")), F.lit(0.0)).alias("tt")
    )
    j = idx.crossJoin(pp).crossJoin(tt)
    n = F.col("n").cast("double")
    tot = n * (n - F.lit(1.0)) / F.lit(2.0)
    exp = F.col("pp") * F.col("tt") / tot
    den = (F.col("pp") + F.col("tt")) / F.lit(2.0) - exp
    return j.select(
        F.col("n").alias("n_items"),
        F.round(
            F.when(F.col("n") < 2, F.lit(1.0))
            .when(den == 0, F.lit(1.0))
            .otherwise((F.col("idx") - exp) / den),
            6,
        ).alias("ari"),
    )
