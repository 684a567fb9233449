"""S6 lineage + metrics tables, and NFC normalization option."""

from hsip.catalog import Catalog
from hsip.config import DedupConfig
from hsip.metrics import Recorder, StageTimer


def test_metrics_and_lineage_rows(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    rec = Recorder(spark, cat, run_id="r1")
    with StageTimer(rec, "stageA"):
        pass
    rec.metric("stageA", "truncated_buckets", 3)
    rec.flush()
    m = cat.read("metrics")
    rows = {(r.stage, r.key): r.value for r in m.collect()}
    assert rows[("stageA", "truncated_buckets")] == 3.0
    assert ("stageA", "wall_sec") in rows
    assert all(r.run_id == "r1" for r in m.collect())

    df = spark.range(100).repartition(4)
    rec.lineage("stageA", df, fingerprint="fp123")
    lin = cat.read("lineage").collect()
    assert sum(r.rows for r in lin) == 100
    assert all(r.fingerprint == "fp123" and r.stage == "stageA" for r in lin)
    assert len({r.partition_id for r in lin}) == len(lin)


def test_nfc_normalization_unifies_forms(spark):
    """é as NFC (U+00E9) vs NFD (e + U+0301) shingle identically with nfc=True."""
    from hsip.shingle import shingle_docs

    nfc_text = "café au lait très bon vraiment"
    nfd_text = "café au lait très bon vraiment"
    df = spark.createDataFrame([(1, nfc_text), (2, nfd_text)], "doc_id int, text string")
    off = {r.id: tuple(r.shingles) for r in
           shingle_docs(df, "doc_id", "text", DedupConfig(shingle_k=2)).collect()}
    on = {r.id: tuple(r.shingles) for r in
          shingle_docs(df, "doc_id", "text", DedupConfig(shingle_k=2, nfc=True)).collect()}
    assert off["1"] != off["2"]
    assert on["1"] == on["2"]


def test_nfc_in_fused_kernel(spark):
    from hsip.textkernel import featurize

    df = spark.createDataFrame(
        [(1, "café x y z w"), (2, "café x y z w")], "doc_id int, text string"
    )
    feats = {r.id: (tuple(r.shingles), r.simhash) for r in
             featurize(df, "doc_id", "text", DedupConfig(shingle_k=2, nfc=True)).collect()}
    assert feats["1"] == feats["2"]
