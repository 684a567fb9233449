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


def test_repetition_signals(spark):
    from hsip.textstats import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "aa bb aa bb aa"),   # 2-grams: aa-bb x2, bb-aa x2; 3-grams: 2 distinct of 3
            (2, "a b c d"),          # all 2-grams unique; no duplicate 3-grams
            (3, "x"),                # too short for any grams
        ],
        "id int, text string",
    )
    rows = {r.id: r for r in repetition_signals(df, "id", "text").collect()}
    assert rows["1"].top_2gram_frac == 0.5
    assert rows["1"].dup_3gram_frac == 0.333333
    assert rows["2"].top_2gram_frac == 0.333333
    assert rows["2"].dup_3gram_frac == 0.0
    assert rows["3"].top_2gram_frac == 0.0
    assert rows["3"].dup_3gram_frac == 0.0


def test_decontaminate(spark):
    from pyspark.sql import functions as F

    from hsip.textstats import decontaminate

    df = spark.createDataFrame(
        [
            (0, "one two three four five"),      # eval
            (1, "zzz one two three four yyy"),   # shares "one two three four"
            (2, "totally unrelated words here"), # clean
            (3, "one two three four one two three four"),  # repeats collapse to 1 DISTINCT shared gram
        ],
        "id int, text string",
    )
    out = {
        r.id: r.n_shared_4grams
        for r in decontaminate(df, "id", "text", F.col("id") == 0, k=4).collect()
    }
    assert out == {"1": 1, "3": 1}


def test_punct_ratio_unicode_and_mean_token_len_whitespace(spark):
    """punct_ratio must not count non-Latin letters as punctuation
    (\\p{L}\\p{N}, not ASCII \\w), and mean_token_len must be the true
    token-chars/tokens ratio, immune to whitespace runs — the old
    (nc-nt+1)/nt shortcut scored indented docs as 'long words'."""
    import duckdb

    from hsip.textstats import curation_verdict, quality_columns

    rows = [
        ("u1", "это чистая русская проза без знаков"),
        ("u2", "clean english prose with no marks"),
        ("u3", "  indented   code\n\n    block  here  "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    q = {r["doc_id"]: r for r in df.select(
        "doc_id", *[v.alias(k) for k, v in
                    quality_columns(F.col("text")).items()]).collect()}
    assert q["u1"]["punct_ratio"] == q["u2"]["punct_ratio"] == 0.0
    # 'indented code block here' = 21 token chars / 4 tokens
    assert q["u3"]["mean_token_len"] == 5.25
    assert q["u3"]["n_tokens"] == 4

    # verdict parity with the generated DuckDB oracle on the same rows
    import pandas as pd

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    from hsip.textstats import curation_oracle_sql

    oracle = {r[0]: (r[1], r[2], r[4], r[5]) for r in
              con.execute(curation_oracle_sql("docs", "doc_id", "text"))
              .fetchall()}
    ours = {r["doc_id"]: (r["n_tokens"], r["mean_token_len"], r["reason"],
                          r["keep"])
            for r in curation_verdict(df, "doc_id", "text").collect()}
    for k in ours:
        assert ours[k][0] == oracle[k][0], k
        assert abs(ours[k][1] - oracle[k][1]) < 1e-9, k
        assert ours[k][2:] == oracle[k][2:], k


def test_char_entropy_known_values(spark):
    """Hand-checkable entropies plus a python-oracle sweep."""
    import collections
    import math

    from hsip.textstats import char_entropy_col

    def oracle(s):
        if not s:
            return 0.0
        cnt = collections.Counter(s)
        n = len(s)
        return -sum(c / n * math.log2(c / n) for c in cnt.values())

    texts = ["aaaa", "ab", "abcd", "", "the quick brown fox jumps",
             "aabbaabb  !!", "x" * 100 + "y",
             # large-alphabet + supplementary-plane coverage: the
             # run-length kernel is alphabet-independent and split("")
             # keeps surrogate pairs intact (codepoint semantics)
             "\u4f60\u597d\u4e16\u754c\u4f60\u597d", "\U0001F600\U0001F600a"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r.id: r.h
        for r in df.select(
            "id", char_entropy_col(F.col("text")).alias("h")
        ).collect()
    }
    assert got[0] == 0.0           # single symbol
    assert abs(got[1] - 1.0) < 1e-9   # two equiprobable symbols = 1 bit
    assert abs(got[2] - 2.0) < 1e-9   # four equiprobable symbols = 2 bits
    assert got[3] == 0.0           # empty text scores 0 by convention
    for i, t in enumerate(texts):
        assert abs(got[i] - oracle(t)) < 1e-9, (i, t)


def test_char_entropy_null_and_partition_invariance(spark):
    from hsip.textstats import char_entropy_col

    df = spark.createDataFrame(
        [(1, None), (2, "mississippi river basin")], "id int, text string"
    )
    sel = lambda d: {
        r.id: r.h
        for r in d.select(
            "id", char_entropy_col(F.col("text")).alias("h")
        ).collect()
    }
    got1, got7 = sel(df.coalesce(1)), sel(df.repartition(7))
    assert got1[1] is None or got1[1] == 0.0  # NULL text: no crash
    assert got1[2] == got7[2] > 0.0           # bit-deterministic per row
