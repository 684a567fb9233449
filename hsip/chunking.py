"""Training-sample chunking: split documents into overlapping token
windows (the standard LLM training-data prep step downstream of dedup).

Two implementations with identical output:

  chunk_docs        — pure SQL (sequence + posexplode + slice +
                      concat_ws): JVM-side, codegen'd, zero Python — the
                      100 TB path, and DuckDB-oracle-able.
  ChunkDocsUDTF     — Python UDTF (SURVEY.md §2.8 U6): one row in, many
                      rows out with per-row logic. Included to cover the
                      lateral-function API surface; per-row Python is the
                      slow path, so production chunking uses chunk_docs.

Chunk grid: token windows of ``chunk_size`` advancing by ``stride =
chunk_size - overlap``; the final partial window is kept iff it adds
tokens beyond the previous chunk (so every token lands in >=1 chunk and
empty docs produce no rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # Spark >= 3.5
    from pyspark.sql.functions import udtf
except ImportError:  # pragma: no cover - older runtimes
    udtf = None


def _n_chunks(n_tokens: Column, chunk_size: int, stride: int) -> Column:
    """ceil((n - overlap) / stride) for n > 0, via integer arithmetic."""
    return F.when(
        n_tokens <= chunk_size, F.when(n_tokens > 0, F.lit(1)).otherwise(F.lit(0))
    ).otherwise(
        F.ceil((n_tokens - F.lit(chunk_size - stride)) / F.lit(stride)).cast("int")
    )


def chunk_docs(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    chunk_size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """(id, tokens) -> (id, chunk_idx, chunk_text, n_chunk_tokens).

    One posexplode over a precomputed chunk-count sequence; the token
    array is sliced per chunk JVM-side. Shuffle-free (narrow), prunes to
    the two referenced columns, and parallelizes by input partition.
    """
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    t = docs.select(F.col(id_col).alias("id"), tokens_col.alias("toks"))
    t = t.withColumn("nc", _n_chunks(F.size("toks"), chunk_size, stride))
    idx = F.sequence(F.lit(0), F.col("nc") - 1)
    out = t.filter(F.col("nc") > 0).select(
        "id",
        "toks",
        F.explode(idx).alias("chunk_idx"),
    )
    sliced = F.slice(F.col("toks"), F.col("chunk_idx") * stride + 1, chunk_size)
    return out.select(
        "id",
        "chunk_idx",
        F.concat_ws(" ", sliced).alias("chunk_text"),
        F.size(sliced).cast("int").alias("n_chunk_tokens"),
    )


if udtf is not None:

    @udtf(returnType="chunk_idx int, chunk_text string, n_chunk_tokens int")
    class ChunkDocsUDTF:
        """U6 lateral table function: same grid as chunk_docs.

        Constructor args are fixed by the SQL registration below; eval()
        receives one document's token string and yields one row per
        chunk. (Python-per-row: API-surface coverage, not the hot path.)
        """

        CHUNK, OVERLAP = 128, 32

        def eval(self, text: str):  # noqa: A003
            toks = [t for t in (text or "").split(" ") if t]
            stride = self.CHUNK - self.OVERLAP
            i = idx = 0
            while i < len(toks):
                window = toks[i : i + self.CHUNK]
                yield idx, " ".join(window), len(window)
                if i + self.CHUNK >= len(toks):
                    break
                i += stride
                idx += 1
else:  # pragma: no cover
    ChunkDocsUDTF = None
