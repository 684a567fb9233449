"""Duplicate-span removal (hsip/spans.py).

Pins: overlap/nested/adjacent merging, out-of-range clamping, full-doc
removal, span-free pass-through, duplicate span rows, and a regression
for the AQE reused-exchange zip failure the original union-based
segment plan hit under orderBy.
"""

from pyspark.sql import functions as F

from hsip.spans import merge_spans, remove_spans


def _run(spark, docs_rows, span_rows):
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    spans = spark.createDataFrame(span_rows, "id long, start int, end int")
    out = remove_spans(docs, "doc_id", "text", spans)
    return {r["doc_id"]: (r["text_clean"], r["n_removed"]) for r in out.collect()}


def test_merge_overlap_nested_adjacent(spark):
    docs = spark.createDataFrame([(0, "x" * 100)], "id long, text string")
    lens = docs.select("id", F.length("text").alias("len"))
    spans = spark.createDataFrame(
        # overlapping, nested, adjacent (start == prev end), disjoint
        [(0, 10, 30), (0, 20, 40), (0, 25, 28), (0, 40, 50), (0, 70, 80)],
        "id long, start int, end int",
    )
    got = sorted((r["start"], r["end"])
                 for r in merge_spans(spans, lens).collect())
    assert got == [(10, 50), (70, 80)]


def test_remove_reference_python_oracle(spark):
    text = "abcdefghijklmnopqrstuvwxyz"
    cases = [
        [(5, 10), (8, 15), (20, 22)],   # overlap + disjoint
        [(-3, 4), (4, 6)],              # clamp + adjacent
        [(0, 99)],                      # full removal
        [],                             # untouched
        [(12, 12), (3, 3)],             # empty spans -> no-op
        [(1, 5), (1, 5), (1, 5)],       # duplicate rows
    ]
    docs_rows = [(i, text) for i in range(len(cases))]
    span_rows = [(i, s, e) for i, sp in enumerate(cases) for (s, e) in sp]
    got = _run(spark, docs_rows, span_rows)

    def oracle(sp):
        keep = [c for j, c in enumerate(text)
                if not any(max(s, 0) <= j < min(e, len(text)) for s, e in sp)]
        return "".join(keep)

    for i, sp in enumerate(cases):
        want = oracle(sp)
        assert got[i] == (want, len(text) - len(want)), f"case {i}"


def test_orderby_over_result_regression(spark):
    # the union-based segment plan failed here with
    # "Can't zip RDDs with unequal numbers of partitions" under AQE
    docs_rows = [(i, f"doc {i} " + "z" * 50) for i in range(20)]
    span_rows = [(i, 2, 9) for i in range(0, 20, 2)]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    spans = spark.createDataFrame(span_rows, "id long, start int, end int")
    rows = remove_spans(docs, "doc_id", "text", spans).orderBy("doc_id").collect()
    assert len(rows) == 20
    assert rows[0]["n_removed"] == 7 and rows[1]["n_removed"] == 0


def test_raw_text_column_untouched(spark):
    got = spark.createDataFrame(
        [(0, "hello world")], "doc_id long, text string"
    )
    spans = spark.createDataFrame([(0, 0, 6)], "id long, start int, end int")
    r = remove_spans(got, "doc_id", "text", spans).collect()[0]
    assert r["text"] == "hello world" and r["text_clean"] == "world"


def test_randomized_batch_vs_mask_oracle(spark):
    """200 seeded random (text, spans) cases — spans may be negative,
    past-end, empty, duplicated, nested, adjacent, or absent — through
    ONE remove_spans job, each compared to the per-character mask
    oracle. Catches island-merge and segment-boundary bugs example
    tests don't reach."""
    import numpy as np

    rng = np.random.default_rng(1234)
    alphabet = "abcdefgh "
    docs_rows, span_rows, want = [], [], {}
    for i in range(200):
        n = int(rng.integers(0, 60))
        text = "".join(rng.choice(list(alphabet), size=n)) if n else ""
        n_spans = int(rng.integers(0, 6))
        spans = []
        for _ in range(n_spans):
            s = int(rng.integers(-5, max(n, 1) + 5))
            e = s + int(rng.integers(-2, 15))
            spans.append((s, e))
            if rng.random() < 0.2:
                spans.append((s, e))  # duplicate row
        docs_rows.append((i, text))
        span_rows.extend((i, s, e) for s, e in spans)
        keep = [
            c for j, c in enumerate(text)
            if not any(max(s, 0) <= j < min(e, n) for s, e in spans)
        ]
        clean = "".join(keep)
        want[i] = (clean, n - len(clean))

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    spans_df = spark.createDataFrame(
        span_rows or [(0, 0, 0)], "id long, start int, end int"
    )
    out = remove_spans(docs, "doc_id", "text", spans_df)
    got = {r["doc_id"]: (r["text_clean"], r["n_removed"]) for r in out.collect()}
    assert got == want
