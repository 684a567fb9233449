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
    """
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("ts"), F.desc("text")
    )
    return (
        turns.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def reassemble(turns: DataFrame, turn_sep: str = "\n") -> DataFrame:
    """C2: turns -> conversations(conv_id, doc_text, n_turns, turns).

    ``turns`` column keeps the full ordered struct array so the per-turn
    equality audit and downstream per-turn features don't need a re-join.
    """
    ordered = F.sort_array(
        F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
    )
    return (
        turns.groupBy("conv_id")
        .agg(ordered.alias("turns"))
        .select(
            "conv_id",
            F.concat_ws(turn_sep, F.transform("turns", lambda t: t["text"])).alias(
                "doc_text"
            ),
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
    mutated. Must be empty — byte-exact per-turn equality invariant."""
    cols = ["conv_id", "turn_idx", "text"]
    return reference.select(cols).join(ours.select(cols), cols, "left_anti")
