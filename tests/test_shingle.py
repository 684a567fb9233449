"""G1 golden tests: known k-grams for a 10-token document (FIXTURES.md §3)."""

from pyspark.sql import functions as F

from hsip.config import DedupConfig
from hsip.shingle import shingle_docs


def _shingles(spark, text, cfg):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return shingle_docs(df, "doc_id", "text", cfg).collect()[0].shingles


def test_kgram_count(spark):
    cfg = DedupConfig(shingle_k=3)
    text = " ".join(f"tok{i}" for i in range(10))
    sh = _shingles(spark, text, cfg)
    assert len(sh) == 10 - 3 + 1  # all distinct


def test_matches_manual_xxhash(spark):
    cfg = DedupConfig(shingle_k=3)
    text = "a b c d"
    sh = _shingles(spark, text, cfg)
    expected = (
        spark.createDataFrame([("a b c",), ("b c d",)], "g string")
        .select(F.xxhash64("g", F.lit(cfg.seed)).alias("h"))
        .collect()
    )
    assert set(sh) == {r.h for r in expected}


def test_short_doc_fallback(spark):
    cfg = DedupConfig(shingle_k=5)
    sh = _shingles(spark, "only two", cfg)
    assert len(sh) == 1  # whole-text hash


def test_normalization_invariance(spark):
    cfg = DedupConfig(shingle_k=2)
    a = _shingles(spark, "Hello   World Foo", cfg)
    b = _shingles(spark, "hello world  foo", cfg)
    assert a == b


def test_duplicate_grams_deduped(spark):
    cfg = DedupConfig(shingle_k=2)
    sh = _shingles(spark, "x y x y x y", cfg)
    assert len(sh) == 2  # "x y" and "y x"
