"""Extract -> remove end-to-end (suffixes positional spans + spans.remove_spans).

The defining property of Lee et al.'s removal step: after rewriting, NO
cross-document duplicate span >= min_len remains, and at least one copy
of each duplicated region survives somewhere.
"""

import pytest
from pyspark.sql import functions as F

from hsip.config import DedupConfig
from hsip.spans import remove_spans
from hsip.suffixes import (
    duplicate_span_positions_local,
    duplicate_spans_local,
    removal_spans_within_groups,
)

DUP = "the quick brown fox jumps over the lazy dog again and again tonight"


def test_positions_local_pairwise():
    texts = {"a": "xx " + DUP + " yy", "b": "zz " + DUP + " qq", "c": "unrelated"}
    spans = duplicate_span_positions_local(texts, min_len=20)
    # one survivor: every marked span is in exactly one of a/b, and the
    # union of marks in that doc covers the full planted region
    marked_docs = {d for d, _, _ in spans}
    assert len(marked_docs) == 1 and marked_docs < {"a", "b"}
    (doc,) = marked_docs
    lo = min(s for d, s, e in spans)
    hi = max(e for d, s, e in spans)
    # the planted region is fully covered (marks may extend into the
    # shared flanking whitespace)
    assert DUP in texts[doc][lo:hi]


def test_positions_local_three_way_keeps_one():
    texts = {k: f"{k}-head {DUP} {k}-tail" for k in ("a", "b", "c")}
    spans = duplicate_span_positions_local(texts, min_len=20)
    survivors = {"a", "b", "c"} - {d for d, _, _ in spans}
    assert len(survivors) == 1


def _clean_texts(spark, texts, min_len):
    docs = spark.createDataFrame(
        [(k, v, "g0") for k, v in texts.items()],
        "doc_id string, text string, grp string",
    )
    cfg = DedupConfig(min_substr_len=min_len, winnow_window=min(min_len, 10))
    spans = removal_spans_within_groups(docs, "doc_id", "text", "grp", cfg)
    out = remove_spans(docs, "doc_id", "text",
                       spans.select(F.col("id"), "start", "end"))
    return {r["doc_id"]: r["text_clean"] for r in out.collect()}


@pytest.mark.parametrize("n_copies", [2, 4])
def test_e2e_no_cross_doc_duplicates_remain(spark, n_copies):
    min_len = 20
    texts = {f"d{i}": f"prefix{i} {DUP} suffix{i}" for i in range(n_copies)}
    texts["clean"] = "totally independent content with nothing shared"
    cleaned = _clean_texts(spark, texts, min_len)
    # the defining property: nothing >= min_len is still duplicated
    assert duplicate_spans_local(cleaned, min_len) == []
    # at least one intact copy survives
    assert sum(DUP in t for t in cleaned.values()) >= 1
    # untouched doc passes through byte-exact
    assert cleaned["clean"] == texts["clean"]


def test_e2e_nested_repeats(spark):
    # a repeat of a repeat: abc shared by all three, abcXabc by two
    core = "segment " * 5                       # 40 chars
    big = core + "XX " + core
    texts = {"a": "a0 " + big, "b": "b0 " + big, "c": "c0 " + core + " c1"}
    cleaned = _clean_texts(spark, texts, min_len=20)
    assert duplicate_spans_local(cleaned, 20) == []
