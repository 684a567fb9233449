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


def shingles_col(norm: Column, cfg: DedupConfig) -> Column:
    """Array<Long> of distinct hashed token k-grams of a normalized string."""
    k = cfg.shingle_k
    toks = tokens_col(norm)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k)), F.lit(cfg.seed)),
    )
    short = F.array(F.xxhash64(norm, F.lit(cfg.seed)))
    return F.when(n >= k, F.array_distinct(grams)).otherwise(short)


def shingle_docs(df: DataFrame, id_col: str, text_col: str, cfg: DedupConfig) -> DataFrame:
    """(id, text) -> (id, shingles: array<long>). Column-pruned scan upstream."""
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        shingles_col(norm_text_col(text_col, cfg), cfg).alias("shingles"),
    )
