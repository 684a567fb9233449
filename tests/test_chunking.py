"""Chunking: SQL scale path == Python UDTF (U6), plus grid edge cases."""

import pytest

from pyspark.sql import functions as F

from hsip.chunking import ChunkDocsUDTF, chunk_docs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d0", ""),                                        # empty -> no chunks
        ("d1", " ".join(f"t{i}" for i in range(5))),       # < chunk -> 1 chunk
        ("d2", " ".join(f"t{i}" for i in range(128))),     # == chunk -> 1 chunk
        ("d3", " ".join(f"t{i}" for i in range(129))),     # chunk + 1 -> 2
        ("d4", " ".join(f"t{i}" for i in range(500))),     # several chunks
    ]
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_sql_chunker_grid(spark, docs):
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    out = chunk_docs(docs, "doc_id", toks, chunk_size=128, overlap=32)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.id, []).append(r)
    assert "d0" not in by_doc
    assert len(by_doc["d1"]) == 1 and by_doc["d1"][0].n_chunk_tokens == 5
    assert len(by_doc["d2"]) == 1
    assert len(by_doc["d3"]) == 2
    # every token covered: chunk i starts at i*96; last chunk reaches 500
    d4 = sorted(by_doc["d4"], key=lambda r: r.chunk_idx)
    assert d4[0].chunk_text.startswith("t0 ")
    assert d4[-1].chunk_text.endswith(" t499")
    # overlap: chunk 1 starts at token 96 (128 - 32)
    assert d4[1].chunk_text.split(" ")[0] == "t96"


def test_udtf_matches_sql_path(spark, docs):
    if ChunkDocsUDTF is None:
        pytest.skip("no UDTF support in this runtime")
    spark.udtf.register("chunk_docs_udtf", ChunkDocsUDTF)
    docs.createOrReplaceTempView("chunk_in")
    got = spark.sql(
        "SELECT doc_id, chunk_idx, chunk_text, n_chunk_tokens "
        "FROM chunk_in, LATERAL chunk_docs_udtf(text)"
    ).collect()
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    want = chunk_docs(docs, "doc_id", toks, chunk_size=128, overlap=32).collect()
    key = lambda r: (r[0], r[1])  # noqa: E731
    assert sorted([tuple(r) for r in got], key=key) == sorted(
        [(r.id, r.chunk_idx, r.chunk_text, r.n_chunk_tokens) for r in want], key=key
    )
