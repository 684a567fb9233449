"""Deterministic splits (hsip/splits.py) and TF-IDF (textstats).

Pins: split stability under repartition and append, salt independence,
fraction concentration, percent-sum validation; TF-IDF scores against a
hand-computed oracle and deterministic tie-breaking.
"""

import math

import pytest
from pyspark.sql import functions as F

from hsip.splits import assign_split, split_oracle_sql
from hsip.textstats import tfidf_top_terms


def test_split_stable_under_repartition_and_append(spark):
    base = spark.range(0, 300).withColumnRenamed("id", "k")
    a = {r["k"]: (r["bucket"], r["split"])
         for r in assign_split(base, "k").collect()}
    b = {r["k"]: (r["bucket"], r["split"])
         for r in assign_split(base.repartition(7), "k").collect()}
    assert a == b
    # appending rows never moves an existing key's split
    grown = spark.range(0, 500).withColumnRenamed("id", "k")
    g = {r["k"]: (r["bucket"], r["split"])
         for r in assign_split(grown, "k").collect()}
    assert all(g[k] == v for k, v in a.items())


def test_split_fractions_and_ranges(spark):
    df = assign_split(spark.range(0, 2000).withColumnRenamed("id", "k"), "k",
                      splits={"train": 80, "val": 10, "test": 10})
    got = {r["split"]: r["n"]
           for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(got) == {"train", "val", "test"}
    # binomial concentration: 80% of 2000 = 1600, sd ~ 18 -> +-6 sd
    assert abs(got["train"] - 1600) < 110
    assert abs(got["val"] - 200) < 60
    # bucket ranges honored exactly
    bad = df.filter(
        ((F.col("split") == "train") & (F.col("bucket") >= 80))
        | ((F.col("split") == "val")
           & ((F.col("bucket") < 80) | (F.col("bucket") >= 90)))
        | ((F.col("split") == "test") & (F.col("bucket") < 90))
    ).count()
    assert bad == 0


def test_split_salt_redraws(spark):
    base = spark.range(0, 400).withColumnRenamed("id", "k")
    a = {r["k"]: r["bucket"] for r in assign_split(base, "k", salt="s1").collect()}
    b = {r["k"]: r["bucket"] for r in assign_split(base, "k", salt="s2").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 300  # independent draws: ~99% move


def test_split_percent_validation(spark):
    with pytest.raises(ValueError):
        assign_split(spark.range(1), "id", splits={"train": 50, "val": 40})


def test_split_oracle_sql_matches_engine(spark):
    import duckdb
    df = assign_split(spark.range(0, 200).withColumnRenamed("id", "doc_id"),
                      "doc_id", salt="x")
    ours = {r["doc_id"]: (r["bucket"], r["split"]) for r in df.collect()}
    bexpr, cexpr = split_oracle_sql("doc_id", salt="x")
    rows = duckdb.sql(
        f"SELECT doc_id, {bexpr} AS b, {cexpr} AS s"
        " FROM (SELECT unnest(range(200)) AS doc_id)"
    ).fetchall()
    assert {k: (b, s) for k, b, s in rows} == ours


def test_tfidf_hand_oracle(spark):
    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"), (2, "cherry date")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=2)
    got = {(r["id"], r["term"]): (r["tf"], r["df"], r["tfidf"], r["term_rank"])
           for r in out.collect()}

    def idf(df_):
        return math.log((3 + 1) / (df_ + 1)) + 1

    assert got[(0, "apple")] == (2, 1, round(2 * idf(1), 6), 1)
    assert got[(0, "banana")] == (1, 2, round(1 * idf(2), 6), 2)
    # doc 2: cherry (df=2) and date (df=1) -> date scores higher
    assert got[(2, "date")][3] == 1 and got[(2, "cherry")][3] == 2


def test_tfidf_deterministic_tiebreak(spark):
    # two terms with identical tf and df tie on score -> term asc wins
    docs = spark.createDataFrame(
        [(0, "zebra alpha"), (1, "zebra alpha")], "doc_id long, text string"
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=1)
    got = {r["id"]: r["term"] for r in out.collect()}
    assert got == {0: "alpha", 1: "alpha"}
