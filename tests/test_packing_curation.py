"""Stratified sampling (splits.stratified_sample), sequence packing
(hsip/packing.py), and the curation-policy verdict (textstats).

Pins: sample stability under repartition/append + fraction
concentration; packing layout invariants (offset arithmetic, shard
determinism, boundary-straddle semantics) and partition-invariance;
one planted fixture per curation drop reason.
"""

import pytest
from pyspark.sql import functions as F

from hsip.packing import pack_sequences
from hsip.splits import SAMPLE_RESOLUTION, stratified_sample
from hsip.textstats import curation_verdict


def _docs(spark, n=400):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("es").alias("lang"),
        F.concat(F.lit("tok "), F.repeat(F.lit("word "), 20),
                 F.col("id").cast("string")).alias("text"),
    )


# --- stratified sampling ----------------------------------------------------

def test_stratified_sample_stable_and_concentrated(spark):
    docs = _docs(spark, 2000)
    kept = stratified_sample(docs, "k", "lang", {"en": 0.5, "es": 0.1})
    a = {r["k"] for r in kept.collect()}
    b = {r["k"] for r in
         stratified_sample(docs.repartition(7), "k", "lang",
                           {"en": 0.5, "es": 0.1}).collect()}
    assert a == b
    # appending rows never flips an existing key's fate
    grown = _docs(spark, 3000)
    g = {r["k"] for r in
         stratified_sample(grown, "k", "lang", {"en": 0.5, "es": 0.1})
         .collect()}
    assert a == {k for k in g if k < 2000}
    by_lang = {r["lang"]: r["n"] for r in
               stratified_sample(docs, "k", "lang", {"en": 0.5, "es": 0.1})
               .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_en = 2000 // 3 + 1  # ids 0,3,...,1998
    n_es = 2000 - n_en
    assert abs(by_lang["en"] / n_en - 0.5) < 0.08
    assert abs(by_lang["es"] / n_es - 0.1) < 0.05


def test_stratified_sample_default_and_validation(spark):
    docs = _docs(spark, 500)
    # default=0 drops strata not listed
    only_en = stratified_sample(docs, "k", "lang", {"en": 1.0})
    assert only_en.filter(F.col("lang") == "es").count() == 0
    assert only_en.filter(F.col("lang") == "en").count() == 500 // 3 + 1
    # default=1 keeps them all
    all_es = stratified_sample(docs, "k", "lang", {"en": 1.0}, default=1.0)
    assert all_es.count() == 500
    with pytest.raises(ValueError):
        stratified_sample(docs, "k", "lang", {"en": 1.5})


def test_stratified_salt_decorrelates_from_split(spark):
    # same salt string as assign_split must still draw independently
    from hsip.splits import assign_split
    docs = _docs(spark, 1000)
    split = assign_split(docs, "k", salt="s1")
    kept = {r["k"] for r in
            stratified_sample(docs, "k", "lang", {"en": 0.9, "es": 0.9},
                              salt="s1").collect()}
    # if correlated, the kept set would align with low buckets
    rows = split.collect()
    low = [r["k"] for r in rows if r["bucket"] < 90]
    frac_low_kept = sum(1 for k in low if k in kept) / len(low)
    assert 0.8 < frac_low_kept < 1.0  # ~0.9 either way, never 1.0 lockstep


# --- sequence packing -------------------------------------------------------

def test_pack_sequences_layout_invariants(spark):
    docs = _docs(spark, 300)
    out = pack_sequences(docs, "k", "text", seq_len=64, n_shards=4)
    rows = out.collect()
    assert len(rows) == 300
    assert {r["shard"] for r in rows} <= set(range(4))
    for r in rows:
        assert 0 <= r["offset"] < 64
        assert r["n_tokens"] == 22  # 'tok' + 20x'word' + id
    # within a shard, cumulative sums reconstruct: sort rows by
    # (seq_id, offset) per shard and the running total matches
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r["seq_id"], r["offset"]))
        cum = 0
        for r in rs:
            assert r["seq_id"] == cum // 64
            assert r["offset"] == cum % 64
            cum += r["n_tokens"]


def test_pack_sequences_partition_invariant(spark):
    docs = _docs(spark, 200)
    a = sorted(map(tuple, pack_sequences(docs, "k", "text", 128, 3)
                   .collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(11), "k", "text",
                                         128, 3).collect()))
    assert a == b
    with pytest.raises(ValueError):
        pack_sequences(docs, "k", "text", seq_len=0)


# --- curation verdict -------------------------------------------------------

def test_curation_verdict_planted_reasons(spark):
    fixtures = [
        ("keep", " ".join(f"word{chr(97 + i % 26)}{chr(97 + i // 26)}"
                          for i in range(30))),
        ("too_short", "just a few words here"),
        ("too_long", " ".join(f"word{chr(97 + i % 26)}{chr(97 + (i // 26) % 26)}{i // 676}"
                              for i in range(10_050))),
        ("short_words", " ".join(["a b"] * 15)),
        ("long_words", " ".join(["absolutely-enormous-hyphenated-token"] * 25)),
        ("low_diversity", " ".join(["same"] * 40)),
        ("digit_heavy", " ".join(f"{i}2345678" for i in range(25))),
    ]
    df = spark.createDataFrame(fixtures, ["doc_id", "text"])
    got = {r["doc_id"]: (r["reason"], r["keep"])
           for r in curation_verdict(df, "doc_id", "text").collect()}
    assert got["keep"] == (None, 1)
    for reason in ("too_short", "too_long", "short_words", "long_words",
                   "low_diversity", "digit_heavy"):
        assert got[reason] == (reason, 0), (reason, got[reason])


def test_curation_verdict_first_fail_order_and_custom_rules(spark):
    # a doc that is BOTH too short and digit-heavy reports too_short
    df = spark.createDataFrame([("d", "111 222 333")], ["doc_id", "text"])
    row = curation_verdict(df, "doc_id", "text").collect()[0]
    assert row["reason"] == "too_short"
    relaxed = dict(min_tokens=1, max_tokens=10, min_mean_token_len=0.0,
                   max_mean_token_len=99.0, min_diversity=0.0,
                   max_digit_ratio=1.0)
    row = curation_verdict(df, "doc_id", "text", rules=relaxed).collect()[0]
    assert row["reason"] is None and row["keep"] == 1
