"""End-to-end transcript clustering vs an independent DuckDB oracle.

The pipeline (reassembly -> fused featurization -> MinHash/LSH ->
exact-Jaccard verify -> large/small-star CC) is configured for
guaranteed candidate recall (r=1 bands over 256 coordinates, caps off),
which makes its output exactly "connected components of the
Jaccard>=0.7 graph" — reproducible in DuckDB with brute-force pair
enumeration and a recursive-CTE reachability closure. This is the
oracle-grade upgrade of the transcript flagship (VERDICT.md r1 item 1);
the documents-table twin runs in the driver contract
(minhash_e2e_clusters)."""

import duckdb

from hsip.config import DedupConfig
from hsip.fixtures.gen import gen_transcripts, to_spark
from hsip.pipeline import run_documents
from hsip.reassemble import dedupe_turn_versions, reassemble

_ORACLE = r"""
WITH RECURSIVE t AS (
    SELECT id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
    FROM docs
),
tok AS (
    SELECT id, nt, list_filter(string_split(nt, ' '), x -> x <> '') AS toks
    FROM t
),
sh AS (
    SELECT id,
           CASE
               WHEN nt = '' THEN []::VARCHAR[]
               WHEN len(toks) >= 5 THEN list_distinct(
                   list_transform(
                       range(1, len(toks) - 3),
                       i -> array_to_string(toks[i:i+4], ' ')
                   ))
               ELSE [nt]
           END AS s
    FROM tok
),
pairs AS (
    SELECT a.id AS ia, b.id AS ib
    FROM sh a JOIN sh b ON a.id < b.id
    WHERE len(list_distinct(list_concat(a.s, b.s))) > 0
      AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.7
),
edges AS (
    SELECT ia AS src, ib AS dst FROM pairs
    UNION ALL
    SELECT ib AS src, ia AS dst FROM pairs
),
reach(id, r) AS (
    SELECT id, id FROM t
    UNION
    SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
"""


def test_transcript_clusters_match_duckdb_cc(spark):
    turns, _truth = to_spark(spark, gen_transcripts(seed=77, n_base=40))
    convs = reassemble(dedupe_turn_versions(turns)).select("conv_id", "doc_text")

    # r=1 over 128 coordinates: P[miss a J>=0.7 pair] <= (1-0.7)^128 ~ 1e-67
    cfg = DedupConfig(
        num_perm=128, lsh_bands=128, lsh_rows=1,
        jaccard_threshold=0.7, bucket_cap=1_000_000,
    )
    res = run_documents(
        spark, convs, "conv_id", "doc_text", cfg, channels=("minhash_lsh",)
    )
    ours = {(r.id, r.cluster_id) for r in res.clusters.collect()}

    pdf = convs.toPandas().rename(
        columns={"conv_id": "id", "doc_text": "text"}
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    theirs = set(map(tuple, con.execute(_ORACLE).fetchall()))

    assert ours == theirs
    # sanity: the corpus actually contains non-singleton clusters
    assert len({c for _, c in ours}) < len(ours)
