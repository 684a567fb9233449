"""Paragraph-level dedup, boilerplate mining, bigram-LM scoring
(hsip/paragraphs.py): keeper determinism, rebuild order, tie-breaks,
and a hand-computed LM oracle."""

import math

import pytest
from pyspark.sql import functions as F

from hsip.paragraphs import (
    bigram_lm_scores,
    dedup_paragraphs,
    frequent_ngrams,
    ngram_strings_col,
    rebuild_docs,
    remove_duplicate_paragraphs,
    split_paragraphs,
)


@pytest.fixture(scope="module")
def docs(spark):
    # d1's footer repeats in d2 and d3; d2's header repeats in d3;
    # d4 is all-unique; d5 is nothing BUT the shared footer.
    rows = [
        ("d1", "alpha beta\n\nshared footer"),
        ("d2", "shared header\n\nshared footer"),
        ("d3", "shared header\n\nmiddle bit\n\nshared footer"),
        ("d4", "totally unique text"),
        ("d5", "shared footer"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_split_paragraphs_positions(spark, docs):
    got = {
        (r.id, r.para_idx): r.para
        for r in split_paragraphs(docs, "doc_id", "text").collect()
    }
    assert got[("d3", 0)] == "shared header"
    assert got[("d3", 1)] == "middle bit"
    assert got[("d3", 2)] == "shared footer"
    assert ("d4", 0) in got and len([k for k in got if k[0] == "d4"]) == 1


def test_dedup_keeps_globally_first_occurrence(spark, docs):
    paras = split_paragraphs(docs, "doc_id", "text")
    kept = dedup_paragraphs(paras).collect()
    footer_keepers = [(r.id, r.para_idx) for r in kept if r.para == "shared footer"]
    header_keepers = [(r.id, r.para_idx) for r in kept if r.para == "shared header"]
    assert footer_keepers == [("d1", 1)]  # min (id, idx) across d1/d2/d3/d5
    assert header_keepers == [("d2", 0)]
    # non-duplicated paragraphs all survive
    assert ("d4", "totally unique text") in {(r.id, r.para) for r in kept}


def test_dedup_partition_invariance(spark, docs):
    paras = split_paragraphs(docs, "doc_id", "text")
    a = sorted(map(tuple, dedup_paragraphs(paras).collect()))
    b = sorted(map(tuple, dedup_paragraphs(paras.repartition(7)).collect()))
    assert a == b


def test_rebuild_order_and_drop_empty_docs(spark, docs):
    out = {
        r.id: (r.clean_text, r.n_paras)
        for r in remove_duplicate_paragraphs(docs, "doc_id", "text").collect()
    }
    assert out["d1"] == ("alpha beta\n\nshared footer", 2)
    assert out["d2"] == ("shared header", 1)  # footer dropped, header kept here
    assert out["d3"] == ("middle bit", 1)
    assert out["d4"] == ("totally unique text", 1)
    assert "d5" not in out  # every paragraph dropped -> no row


def test_min_copies_threshold(spark, docs):
    paras = split_paragraphs(docs, "doc_id", "text")
    kept = dedup_paragraphs(paras, min_copies=5).collect()
    # footer occurs 4x, header 2x: below threshold, everything survives
    assert len(kept) == paras.count()


def test_ngram_strings(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    toks = F.split("text", " ")
    got = df.select(ngram_strings_col(toks, 3).alias("g")).collect()
    assert sorted(map(tuple, (r.g for r in got))) == [(), ("a b c", "b c d")]


def test_frequent_ngrams_doc_frequency_and_tiebreak(spark):
    # "x y z" in 3 docs (twice in d1 - counted ONCE); "a b c" in 2 docs;
    # "p q r" and "q r s" in 1 doc each (tie broken lexicographically).
    rows = [
        ("d1", "x y z x y z"),
        ("d2", "x y z"),
        ("d3", "x y z a b c"),
        ("d4", "a b c"),
        ("d5", "p q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    toks = F.split("text", " ")
    got = [tuple(r) for r in frequent_ngrams(df, "doc_id", toks, n=3, top_k=4).collect()]
    assert got[0] == ("x y z", 3)
    assert got[1] == ("a b c", 2)
    assert got[2:] == [("p q r", 1), ("q r s", 1)]


def test_bigram_lm_hand_oracle(spark):
    # corpus: d1 = "a b a b", d2 = "a b", d3 = "c"  (c has no bigrams)
    # unigrams: a:3 b:3 c:1 -> V=3
    # bigrams:  "a b":3, "b a":1
    rows = [("d1", "a b a b"), ("d2", "a b"), ("d3", "c")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    toks = F.split("text", " ")
    got = {r.id: (r.n_bigrams, r.mean_nll) for r in
           bigram_lm_scores(df, "doc_id", toks).collect()}
    p_ab = (3 + 1) / (3 + 3)   # c("a b")+1 / c(a)+V
    p_ba = (1 + 1) / (3 + 3)
    d1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    d2 = -math.log(p_ab)
    assert "d3" not in got
    assert got["d1"][0] == 3 and abs(got["d1"][1] - round(d1, 6)) < 1e-9
    assert got["d2"][0] == 1 and abs(got["d2"][1] - round(d2, 6)) < 1e-9


def test_rebuild_handles_sparse_indices(spark):
    # surviving indices 0 and 7 (gaps from dropped paragraphs) keep order
    rows = [("d", 7, "tail"), ("d", 0, "head")]
    df = spark.createDataFrame(rows, "id string, para_idx int, para string")
    out = rebuild_docs(df).collect()
    assert out[0].clean_text == "head\n\ntail" and out[0].n_paras == 2
