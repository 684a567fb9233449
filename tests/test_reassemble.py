"""C1-C3: turn-version dedupe, stable reassembly, per-turn equality audit."""

from datetime import datetime

from hsip import schemas
from hsip.reassemble import (
    audit_turn_equality,
    dedupe_turn_versions,
    explode_turns,
    reassemble,
)


def _turns(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)


def test_reassembly_order_stable_under_shuffled_input(spark):
    rows = [
        ("c1", 2, "user", "third", "", datetime(2025, 1, 1, 0, 2)),
        ("c1", 0, "user", "first", "", datetime(2025, 1, 1, 0, 0)),
        ("c1", 1, "assistant", "second", "", datetime(2025, 1, 1, 0, 1)),
    ]
    got = reassemble(_turns(spark, rows)).collect()[0]
    assert got.doc_text == "first\nsecond\nthird"
    assert got.n_turns == 3
    assert [t.turn_idx for t in got.turns] == [0, 1, 2]


def test_turn_version_dedupe_keeps_latest_ts(spark):
    rows = [
        ("c1", 0, "user", "stale", "", datetime(2025, 1, 1, 0, 0)),
        ("c1", 0, "user", "fresh", "", datetime(2025, 1, 1, 5, 0)),
        ("c1", 1, "assistant", "reply", "", datetime(2025, 1, 1, 0, 1)),
    ]
    got = dedupe_turn_versions(_turns(spark, rows)).orderBy("turn_idx").collect()
    assert [r.text for r in got] == ["fresh", "reply"]


def test_per_turn_equality_roundtrip(spark):
    rows = [
        ("c1", 0, "user", "Hello  World", "", datetime(2025, 1, 1)),
        ("c1", 1, "tool", "<raw>\tbytes</raw>", "search", datetime(2025, 1, 2)),
        ("c2", 0, "user", "", "", datetime(2025, 1, 3)),
    ]
    raw = _turns(spark, rows)
    ours = explode_turns(reassemble(dedupe_turn_versions(raw)))
    # both directions empty -> byte-exact per-turn equality
    assert audit_turn_equality(ours, raw).count() == 0
    assert audit_turn_equality(raw, ours).count() == 0


def test_audit_catches_mutation(spark):
    rows = [("c1", 0, "user", "original", "", datetime(2025, 1, 1))]
    raw = _turns(spark, rows)
    mutated = _turns(
        spark, [("c1", 0, "user", "ORIGINAL", "", datetime(2025, 1, 1))]
    )
    assert audit_turn_equality(mutated, raw).count() == 1


def test_null_turn_text_keeps_slot_and_audit_is_null_safe(spark):
    """NULL turn text must contribute an EMPTY doc_text slot (separator
    survives), so ['a', NULL, 'b'] and ['a', 'b'] reassemble differently;
    and the C3 audit must treat identical NULL rows on both sides as
    equal (plain equi-join would report them as lost)."""
    from datetime import datetime

    from hsip.reassemble import audit_turn_equality, reassemble

    t0 = datetime(2025, 6, 1)
    rows = [
        ("c1", 0, "user", "a", "", t0), ("c1", 1, "tool", None, "srch", t0),
        ("c1", 2, "user", "b", "", t0),
        ("c2", 0, "user", "a", "", t0), ("c2", 1, "user", "b", "", t0),
    ]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    turns = spark.createDataFrame(rows, schema)
    docs = {r["conv_id"]: r["doc_text"]
            for r in reassemble(turns).collect()}
    assert docs["c1"] == "a\n\nb"
    assert docs["c2"] == "a\nb"
    assert docs["c1"] != docs["c2"]

    audit = audit_turn_equality(turns, turns)
    assert audit.count() == 0, "identical NULL-text rows flagged as lost"
