"""Duplicate-span REMOVAL — rewrite text with char ranges excised.

The end state of the ExactSubstr pipeline (Lee et al., ACL'22
"Deduplicating Training Data Makes Language Models Better"): once
duplicate spans are known, the corpus is rewritten with those spans cut
out of all-but-one occurrence. This module is the generic rewrite half:
given ANY span table ``(id, start, end)`` (0-based, end-exclusive,
possibly overlapping / out of range / duplicated), produce the cleaned
text. Which occurrences to cut is the caller's policy; the extraction
half lives in suffixes.exact_substr_within_groups.

Everything is pure SQL — windows, groupBy, one text join — zero Python:

1. clamp spans to [0, len] against doc length, drop empties;
2. merge overlapping/adjacent spans per doc (gaps-and-islands over a
   running max of ``end``);
3. segment: each kept piece runs from the previous span's end (lag,
   default 0) to the next span's start, plus one tail piece per doc;
4. rewrite: join segments to the text ONCE, substring out the pieces,
   reassemble with the same sort_array(collect_list(struct)) idiom as
   conversation reassembly (one shuffle keyed by id, in-group sort).

Scale shape: all windows partition by doc id and are bounded by
spans-per-doc; shuffled bytes ≈ kept text bytes (the pieces), the same
order as the reassembly stage. Docs without spans pass through a left
join untouched — their text is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_spans(spans: DataFrame, lens: DataFrame) -> DataFrame:
    """(id, start, end) + (id, len) -> non-overlapping clamped spans.

    Standard gaps-and-islands: after sorting by (start, end), a span
    starts a new island iff its start exceeds the running max of all
    previous ends; islands collapse to (min start, max end).
    """
    clamped = (
        spans.join(lens, "id")
        .select(
            "id",
            F.greatest(F.col("start"), F.lit(0)).alias("start"),
            F.least(F.col("end"), F.col("len")).alias("end"),
        )
        .filter(F.col("end") > F.col("start"))
    )
    w = Window.partitionBy("id").orderBy("start", "end")
    prev_max = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max.isNull() | (F.col("start") > prev_max), 1
    ).otherwise(0)
    grouped = clamped.withColumn(
        "_g", F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return grouped.groupBy("id", "_g").agg(
        F.min("start").alias("start"), F.max("end").alias("end")
    ).drop("_g")


def remove_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    spans: DataFrame,
    out_col: str = "text_clean",
) -> DataFrame:
    """docs + spans(id, start, end) -> docs with ``out_col`` (the text
    with every merged span excised) and ``n_removed`` (chars cut).
    Span-free docs pass through with ``n_removed = 0``.
    """
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_text")
    )
    lens = base.select("id", F.length("_text").alias("len"))
    merged = merge_spans(spans.select("id", "start", "end"), lens)

    # kept segments, ONE window pass and no union (a union feeding the
    # downstream sort-merge joins trips AQE's reused-exchange zip when
    # the two branches coalesce to different partition counts): every
    # span row emits the piece BEFORE it ([prev end | 0, start)), and
    # the LAST span row (lead(start) is null) also emits the tail
    # ([end, len)) — exploded from a per-row 2-element array.
    w = Window.partitionBy("id").orderBy("start")
    neighbors = merged.join(lens, "id").select(
        "id", "start", "end", "len",
        F.lag("end", 1, 0).over(w).alias("_prev_end"),
        F.lead("start", 1).over(w).alias("_next_start"),
    )
    head = F.struct(
        F.col("_prev_end").alias("seg_start"),
        F.col("start").alias("seg_end"),
    )
    tail = F.when(
        F.col("_next_start").isNull(),
        F.struct(F.col("end").alias("seg_start"), F.col("len").alias("seg_end")),
    )
    segments = (
        neighbors
        .select("id", F.explode(F.filter(F.array(head, tail),
                                         lambda s: s.isNotNull())).alias("s"))
        .select("id", F.col("s.seg_start").alias("seg_start"),
                F.col("s.seg_end").alias("seg_end"))
        .filter(F.col("seg_end") > F.col("seg_start"))
    )

    # single text join; pieces reassemble in seg_start order (the
    # conversation-reassembly idiom: sort_array inside the group)
    pieces = segments.join(base, "id").select(
        "id", "seg_start",
        F.substring(
            "_text", F.col("seg_start") + 1, F.col("seg_end") - F.col("seg_start")
        ).alias("piece"),
    )
    rewritten = (
        pieces.groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("seg_start", "piece"))).alias("p"))
        .select(
            "id",
            F.concat_ws("", F.transform("p", lambda s: s["piece"])).alias("_clean"),
        )
    )
    # docs with spans but NO kept segments (everything removed) still
    # need a row: merged ids missing from `rewritten` get ''
    covered = merged.select("id").distinct().join(
        rewritten, "id", "left_outer"
    ).select("id", F.coalesce("_clean", F.lit("")).alias("_clean"))

    out = base.join(covered, "id", "left_outer").select(
        "id",
        "_text",
        F.coalesce("_clean", F.col("_text")).alias(out_col),
    )
    return (
        out.withColumn(
            "n_removed",
            (F.length("_text") - F.length(out_col)).cast("long"),
        )
        .withColumnRenamed("id", id_col)
        .withColumnRenamed("_text", text_col)
    )
