"""Bucketed-table co-located joins: the plan contract.

Two tables written through Catalog.write_bucketed with the same bucket
count and key must join with ZERO Exchange of any kind (bucket i of the
left zips with bucket i of the right, task-local). The same data written
as plain parquet must show the shuffle the bucketing removed — both
directions pinned so a regression in either the writer or the reader
path (losing bucket metadata) fails loudly.
"""

import pyspark.sql.functions as F

from hsip.catalog import Catalog


def _sides(spark):
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v1")
    )
    right = spark.range(2500, 7500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    return left, right


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    left, right = _sides(spark)
    cat.write_bucketed(left, "bkt.left", 8, ["k"])
    cat.write_bucketed(right, "bkt.right", 8, ["k"])
    lt, rt = cat.read_bucketed("bkt.left"), cat.read_bucketed("bkt.right")

    joined = lt.hint("merge").join(rt, "k")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # neither shuffle nor broadcast
    assert joined.count() == 2500

    # grouping on the bucket key is exchange-free too
    agg = lt.groupBy("k").agg(F.sum("v1").alias("s"))
    assert "Exchange" not in _plan(agg), _plan(agg)
    assert agg.count() == 5000


def test_unbucketed_negative_control_shuffles(spark, tmp_path):
    left, right = _sides(spark)
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)
    lt, rt = spark.read.parquet(lp), spark.read.parquet(rp)
    joined = lt.hint("merge").join(rt, "k")
    assert "Exchange" in _plan(joined)
    assert joined.count() == 2500


def test_bucketed_join_values_match_unbucketed(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    left, right = _sides(spark)
    cat.write_bucketed(left, "bkt.vleft", 4, ["k"])
    cat.write_bucketed(right, "bkt.vright", 4, ["k"])
    got = (
        cat.read_bucketed("bkt.vleft")
        .join(cat.read_bucketed("bkt.vright"), "k")
        .orderBy("k")
        .collect()
    )
    want = left.join(right, "k").orderBy("k").collect()
    assert got == want


def test_write_bucketed_overwrites(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    left, _ = _sides(spark)
    cat.write_bucketed(left, "bkt.ow", 4, ["k"])
    cat.write_bucketed(left.limit(10), "bkt.ow", 4, ["k"])
    assert cat.read_bucketed("bkt.ow").count() == 10
