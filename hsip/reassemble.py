"""C1-C3 — conversation reassembly from turns (reference stage 1 at scale).

C1: turn-version dedupe — duplicated (conv_id, turn_idx) keeps the latest
``ts`` (late-arriving re-writes). C2: reassembly under stable
(conv_id, turn_idx) ordering — the [SPEC] invariant (BASELINE.json:6).
The sort happens *inside* each group via sort_array over structs whose
leading field is turn_idx: one shuffle (the groupBy), no global sort.
C3: the per-turn text-equality audit — an anti-join that must be empty
(BASELINE.json:15 invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_turn_versions(turns: DataFrame) -> DataFrame:
    """C1: keep the latest-ts row per (conv_id, turn_idx).

    Exact-ts collisions tie-break on lexicographic-max ``text`` — the ONE
    rule shared with the streaming path (streaming.stateful_reassemble),
    chosen because it is engine-portable (plain ORDER BY, no
    engine-specific hash) so batch, streaming, and any SQL oracle all
    keep the same surviving row.

    Physical shape (r6, guide §2.4 "share one exchange"): the corpus is
    hash-partitioned on ``conv_id`` ONCE. HashPartitioning(conv_id)
    satisfies the window's (conv_id, turn_idx) clustering requirement
    (subset rule), and the downstream ``reassemble`` groupBy(conv_id)
    reuses the same layout — so C1+C2 together move the turn text over
    the network exactly once, where the bare window exchange on
    (conv_id, turn_idx) could never serve the conv_id groupBy and the
    corpus shuffled twice. Per-conv volume is bounded by the
    max_turns_per_conv guard, so the coarser key does not create
    unsplittable partitions. Row results are identical (the window
    ordering is deterministic within each (conv_id, turn_idx) group
    regardless of partitioning).
    """
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("ts"), F.desc("text")
    )
    return (
        turns.repartition("conv_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def reassemble(turns: DataFrame, turn_sep: str = "\n") -> DataFrame:
    """C2: turns -> conversations(conv_id, doc_text, n_turns, turns).

    ``turns`` column keeps the full ordered struct array so the per-turn
    equality audit and downstream per-turn features don't need a re-join.

    NULL turn text contributes an EMPTY slot (its separator survives),
    not a skipped one: concat_ws drops NULL elements entirely, so
    without the coalesce ['a', NULL, 'b'] and ['a', 'b'] would
    reassemble byte-identically and dedup would collapse two
    structurally different conversations. NULL and '' read the same in
    doc_text by design — the turns struct and the C3 audit (null-safe)
    still distinguish them.
    """
    ordered = F.sort_array(
        F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
    )
    return (
        turns.groupBy("conv_id")
        .agg(ordered.alias("turns"))
        .select(
            "conv_id",
            F.concat_ws(
                turn_sep,
                F.transform("turns",
                            lambda t: F.coalesce(t["text"], F.lit("")))
            ).alias("doc_text"),
            F.size("turns").cast("int").alias("n_turns"),
            "turns",
        )
    )


def explode_turns(conversations: DataFrame) -> DataFrame:
    """Inverse of reassemble: back to the authoritative turn shape."""
    return conversations.select(
        "conv_id", F.explode("turns").alias("t")
    ).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").alias("ts"),
    )


def audit_turn_equality(ours: DataFrame, reference: DataFrame) -> DataFrame:
    """C3: rows of ``reference`` whose (conv_id, turn_idx, text) we lost or
    mutated. Must be empty — byte-exact per-turn equality invariant.

    The join is null-safe on text (the schema allows NULL turn text,
    e.g. tool-only turns): a plain equi-join would report an identical
    NULL row on both sides as lost, failing the audit spuriously."""
    cols = ["conv_id", "turn_idx", "text"]
    r, o = reference.select(cols).alias("r"), ours.select(cols).alias("o")
    cond = None
    for c in cols:
        eq = F.col(f"r.{c}").eqNullSafe(F.col(f"o.{c}"))
        cond = eq if cond is None else (cond & eq)
    return r.join(o, cond, "left_anti")
