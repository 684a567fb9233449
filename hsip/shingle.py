"""G1 — k-shingling. Pure-SQL path: higher-order functions + xxhash64,
fully inside whole-stage codegen; no Python crossing (SURVEY.md §2.4 G1).

Each document becomes the distinct set of 64-bit hashes of its token
k-grams (Broder, SEQUENCES 1997). Documents shorter than k tokens fall
back to a single whole-text hash so exact short duplicates still collide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import DedupConfig
from .normalize import norm_text_col, tokens_col


def shingles_col(toks: Column, norm: Column, cfg: DedupConfig) -> Column:
    """Array<Long> of distinct hashed token k-grams.

    ``toks`` MUST be a materialized column reference (not an expression
    tree): expressions referenced inside a higher-order-function lambda
    are re-evaluated per array element, which turns an O(n) shingle pass
    into O(n^2) regex evaluations for long documents.
    """
    k = cfg.shingle_k
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k)), F.lit(cfg.seed)),
    )
    short = F.array(F.xxhash64(norm, F.lit(cfg.seed)))
    return F.when(n >= k, F.array_distinct(grams)).otherwise(short)


def shingle_docs(df: DataFrame, id_col: str, text_col: str, cfg: DedupConfig) -> DataFrame:
    """(id, text) -> (id, shingles: array<long>). Column-pruned scan upstream.

    Two projections on purpose: tokens are bound to a column first so the
    k-gram lambda reads a row field instead of re-running normalization
    per element (CollapseProject keeps them separate because the alias is
    referenced more than once).
    """
    normed = df.select(
        F.col(id_col).cast("string").alias("id"),
        norm_text_col(text_col, cfg).alias("_norm"),
    )
    tokenized = normed.select("id", "_norm", tokens_col(F.col("_norm")).alias("_toks"))
    return tokenized.select(
        "id",
        shingles_col(F.col("_toks"), F.col("_norm"), cfg).alias("shingles"),
    )
