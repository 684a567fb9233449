"""Pins for the round-6 ADVICE.md correctness fixes.

1. latest_index_versions is NULL-safe: a key whose newest version is a
   legacy (NULL ingested_at) row must survive the join-back, and legacy
   rows must lose to any stamped version under the struct ordering.
2. Appends resolve the table's recorded physical layout BEFORE the
   clustering step: a plain append to a sort_by table lands its files
   range-clustered (disjoint footer stats), not just manifest-labeled.
3. An append whose explicit layout conflicts with the recorded one is
   rejected, so a manifest can never carry both sort_by and zorder_by.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from hsip.catalog import Catalog


def test_latest_index_versions_null_safe_and_ordered(spark):
    from hsip.streaming import latest_index_versions

    rows = [
        # key "a": only legacy rows (NULL ingested_at) -> batch order wins
        ("a", None, 0, "s0", "a-old"),
        ("a", None, 1, "s0", "a-new"),
        # key "b": legacy + stamped -> stamped wins regardless of batch
        ("b", None, 9, "s0", "b-legacy"),
        ("b", "2026-01-02 00:00:00", 0, "s1", "b-stamped"),
        # key "c": two stamped -> newest wall-clock wins
        ("c", "2026-01-01 00:00:00", 5, "s0", "c-old"),
        ("c", "2026-01-03 00:00:00", 1, "s1", "c-new"),
    ]
    idx = spark.createDataFrame(
        rows, "id string, ingested_at string, batch_id long, "
              "stream_id string, payload string"
    ).withColumn("ingested_at", F.col("ingested_at").cast("timestamp"))
    got = {r["id"]: r["payload"]
           for r in latest_index_versions(idx, ["id"]).collect()}
    # pre-fix, key "a" and "b"-via-legacy rows vanished (NULL != NULL)
    assert got == {"a": "a-new", "b": "b-stamped", "c": "c-new"}


def _file_ranges(wh: str, ident: str, col: str):
    import pyarrow.parquet as pq

    data = os.path.join(wh, *ident.split("."), "data")
    out = []
    for fn in glob.glob(os.path.join(data, "*.parquet")):
        vals = pq.read_table(fn, columns=[col])[col].to_pylist()
        if vals:
            out.append((min(vals), max(vals)))
    return sorted(out)


def test_append_physically_inherits_sort_clustering(spark, tmp_path):
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 2000).alias("v"))
    cat.write(df.repartition(8), "t.sorted", sort_by=["v"])
    # plain append, no layout args: the appended snapshot must be
    # range-clustered on v too (pre-fix it landed hash-interleaved
    # because inheritance resolved after the clustering step)
    delta = spark.range(2000, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 4000).alias("v"))
    cat.write(delta.repartition(8), "t.sorted", mode="append")
    rs = _file_ranges(wh, "t.sorted", "v")
    assert len(rs) > 2
    overlaps = sum(1 for (l1, h1), (l2, _h2) in zip(rs, rs[1:]) if h1 > l2)
    # two independently range-clustered snapshots can overlap each other
    # at most where their range boundaries interleave; a hash-shuffled
    # append overlaps nearly everywhere. Require mostly-disjoint files.
    assert overlaps <= len(rs) // 2, f"append not clustered: {rs}"
    assert cat.manifest("t.sorted").get("sort_by") == ["v"]
    assert cat.read("t.sorted").count() == 4000


def test_append_layout_conflict_rejected(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    grid = spark.range(0, 128).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") * 2654435761) % 16).alias("y"),
        F.col("id").alias("p"),
    )
    cat.write(grid, "t.zc", zorder_by=["x", "y"], zorder_bits=4)
    delta = spark.createDataFrame([(1, 2, 999)], ["x", "y", "p"])
    with pytest.raises(ValueError, match="conflicts"):
        cat.write(delta, "t.zc", mode="append", sort_by=["x"])
    # manifest untouched by the rejected append
    man = cat.manifest("t.zc")
    assert man.get("zorder_by") == ["x", "y"]
    assert man.get("sort_by") is None

    cat.write(grid, "t.sc", sort_by=["x"])
    with pytest.raises(ValueError, match="conflicts"):
        cat.write(delta, "t.sc", mode="append", zorder_by=["x", "y"])
