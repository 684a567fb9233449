"""Training-sequence packing — shard-local, content-addressed, pure SQL.

LLM pretraining concatenates documents into fixed-token-budget sequences
(``seq_len``) before chunking; the pipeline step that matters at scale is
the deterministic *assignment*: which sequence does each doc land in, and
at what token offset. The classic plan — one global ORDER BY + running
sum — is a scale-killer (single-partition window). Instead:

1. each doc gets a stable md5 order key (content-addressed: the layout
   never depends on input partitioning or arrival order);
2. the key's top bits pick one of ``n_shards`` shards — at cluster scale
   set ``n_shards`` ~ corpus_tokens / (executor_memory-sized stripe) so
   every shard's window fits one task;
3. a per-shard running token sum assigns ``seq_id = floor(cum/seq_len)``
   and ``offset = cum % seq_len`` (concat-then-chunk semantics: a doc
   that straddles a boundary starts in the sequence where its first
   token falls, exactly like the downstream chunker will see it).

Everything is built-in SQL (split/md5/window) — no Python in the path —
and the same expressions evaluate verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    key_col: str,
    text_col: str,
    seq_len: int = 2048,
    n_shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """Assign every doc a (shard, seq_id, offset) packing slot.

    Output: ``key_col, shard, seq_id, offset, n_tokens`` — one row per
    input doc. Deterministic: same corpus -> same layout regardless of
    partitioning, executor count, or append order of unrelated rows.
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError("seq_len and n_shards must be positive")
    key = F.col(key_col)
    h = F.md5(F.concat(key.cast("string"), F.lit("|pack:" + salt)))
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    base = df.select(
        key_col,
        h.alias("_h"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards)
        .alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.select(
        key_col,
        "shard",
        F.floor(cum / seq_len).cast("long").alias("seq_id"),
        (cum % seq_len).cast("long").alias("offset"),
        "n_tokens",
    )


def packing_oracle_sql(
    table: str,
    key_expr: str,
    text_expr: str,
    seq_len: int = 2048,
    n_shards: int = 8,
    salt: str = "",
) -> str:
    """DuckDB SQL computing the identical packing layout — one definition
    drives engine and oracle."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || '|pack:{salt}')"
    toks = (
        f"list_filter(string_split_regex({text_expr}, '\\s+'), x -> x <> '')"
    )
    return f"""
        WITH t AS (
            SELECT {key_expr} AS k, {h} AS h,
                   CAST(('0x' || substr({h}, 1, 8))::UBIGINT % {n_shards}
                        AS BIGINT) AS shard,
                   CAST(len({toks}) AS BIGINT) AS n_tokens
            FROM {table}
        ), c AS (
            SELECT k, shard, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY h, k
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum
            FROM t
        )
        SELECT k AS {key_expr}, shard,
               CAST(floor(cum * 1.0 / {seq_len}) AS BIGINT) AS seq_id,
               CAST(cum % {seq_len} AS BIGINT) AS offset,
               n_tokens
        FROM c
    """
