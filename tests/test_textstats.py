"""Text-analysis operators: token counting, quality, lang-ID, fingerprints."""

from pyspark.sql import functions as F

from hsip.textstats import (
    attach_quality,
    bpe_ish_token_count_col,
    char_ngram_profile,
    doc_rolling_fingerprint,
    lang_id_stopwords,
    token_count_col,
)


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello, world! it's 42%")], "id int, text string")
    got = df.select(
        token_count_col(F.col("text")).alias("ws"),
        bpe_ish_token_count_col(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert got.ws == 4
    # hello , world ! it ' s 42 %
    assert got.bpe == 9


def test_quality_signals(spark):
    df = spark.createDataFrame(
        [(1, "aa aa aa aa"), (2, "the quick brown fox!!!")], "id int, text string"
    )
    rows = {r.id: r for r in attach_quality(df, "text").collect()}
    assert rows[1].diversity == 0.25
    assert rows[2].diversity == 1.0
    assert rows[2].punct_ratio > 0
    assert rows[1].punct_ratio == 0.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat and it was happy for that"),
            (2, "le chat et les enfants en une maison que"),
            (3, "el perro y la casa de los amigos es que"),
            (4, "zzz qqq xxx"),
        ],
        "id int, text string",
    )
    got = {r.id: r.lang_pred for r in lang_id_stopwords(df, "id", "text").collect()}
    assert got["1"] == "en"
    assert got["2"] == "fr"
    assert got["3"] == "es"
    assert got["4"] == "und"


def test_ngram_profile_shape(spark):
    df = spark.createDataFrame([(1, "abcdefg"), (2, "")], "id int, text string")
    rows = {r.id: r.ngram_profile for r in char_ngram_profile(df, "id", "text").collect()}
    assert len(rows["1"]) == 64
    assert abs(sum(rows["1"]) - 1.0) < 1e-9
    assert sum(rows["2"]) == 0.0


def test_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "Some  Text"), (2, "some text"), (3, "other")], "id int, text string"
    )
    rows = {r.id: r.fp64 for r in doc_rolling_fingerprint(df, "id", "text").collect()}
    assert rows["1"] == rows["2"]  # normalization-invariant
    assert rows["1"] != rows["3"]


def test_weighted_mean_udaf_matches_sql_twin(spark):
    """U5 grouped-agg pandas UDAF == the decomposed sum(v*w)/sum(w),
    including the zero-weight group (denominator clamps to 1)."""
    import pyspark.sql.functions as F

    from hsip.textstats import weighted_mean

    df = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 3), ("b", 5, 0), ("b", 7, 0), ("c", 100, 7)],
        "g string, v long, w long",
    ).repartition(4)
    got = {
        r.g: r.wm
        for r in df.groupBy("g").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    want = {
        r.g: r.wm
        for r in df.groupBy("g")
        .agg(
            (
                F.sum(F.col("v") * F.col("w"))
                / F.greatest(F.sum("w"), F.lit(1)).cast("double")
            ).alias("wm")
        )
        .collect()
    }
    assert got == want
    assert got["b"] == 0.0  # zero total weight -> 0, not NaN
