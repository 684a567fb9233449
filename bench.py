"""Per-round benchmark harness (driver contract, TESTDATA.md).

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Workloads:
  doc_dedup_3ch     — full 3-channel near-dup clustering of ``documents``
  transcript_dedup  — transcript pipeline on the seeded synthetic corpus
                      (cached to .bench_cache as parquet; generation cost
                      is excluded — the metric is engine throughput)
  q1 / q3 / window  — relational representatives on lineitem/orders
  embedding_topk    — brute-force cosine top-k over ``embeddings``

Scaling protocol (N -> 4N evidence, BASELINE.md): bench/scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BASE = int(os.environ.get("HSIP_BENCH_NBASE", "2000"))
BENCH_RUNS = int(os.environ.get("HSIP_BENCH_RUNS", "2"))


def _transcripts_path() -> str:
    """Seeded synthetic transcript corpus, generated once and cached."""
    path = os.path.join(REPO, ".bench_cache", f"transcripts_n{N_BASE}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from hsip.fixtures.gen import gen_transcripts

        os.makedirs(path, exist_ok=True)
        gen = gen_transcripts(seed=42, n_base=N_BASE)
        pdf = gen.transcripts
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark can't read ns INT64
        pdf.to_parquet(os.path.join(path, "part0.parquet"), index=False)
        with open(os.path.join(path, "_SUCCESS"), "w") as f:
            f.write("ok")
    return path


def run(spark, sf_dir: str) -> dict:
    import __spark_entry__ as E
    from hsip import schemas
    from hsip.config import DedupConfig
    from hsip.pipeline import run_documents, run_transcripts

    tpath = _transcripts_path()
    timings: dict[str, float] = {}
    raw_walls: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    def timed(name, fn, prep=None, runs=BENCH_RUNS):
        """Best-of-N wall per query: the sandbox host is shared (co-tenant
        load avg 6-16), so a single run can't attribute ±0.5 s deltas —
        min-of-N is the least-interfered measurement (same protocol as
        bench/scaling.py). clearCache between runs keeps each run a REAL
        run (identical re-built plans would otherwise serve run 2 from
        run 1's CacheManager entries); ``prep`` re-establishes any input
        cache that's deliberately excluded from the metric."""
        out = None
        walls = []
        for _ in range(max(1, runs)):
            spark.catalog.clearCache()
            if prep is not None:
                prep()
            t0 = time.time()
            out = fn()
            walls.append(round(time.time() - t0, 3))
        timings[name] = min(walls)
        raw_walls[name] = walls
        return out

    # 1. document 3-channel dedup (the flagship at bench scale)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    cfg = DedupConfig(jaccard_threshold=0.7)
    n_docs = docs.count()
    res = timed(
        "doc_dedup_3ch",
        lambda: run_documents(spark, docs, "doc_id", "text", cfg),
    )
    extras["doc_dedup_docs_per_sec"] = round(n_docs / timings["doc_dedup_3ch"], 1)
    extras["doc_dedup_n_clustered"] = res.verified.filter("verdict").count()
    # per-stage walls of the LAST run (lazy stages fold into `verified`)
    stages = {"doc_dedup_3ch": res.stats.get("stage_walls", {})}

    # 2. transcript pipeline (turns/sec is the headline unit, BASELINE.json:2)
    turns = spark.read.schema(schemas.TRANSCRIPTS).parquet(tpath)
    n_turns = turns.count()
    tres = timed(
        "transcript_dedup",
        lambda: run_transcripts(spark, turns, DedupConfig()),
        prep=lambda: turns.cache().count(),  # input IO excluded from metric
    )
    extras["transcript_turns"] = n_turns
    extras["transcript_turns_per_sec"] = round(n_turns / timings["transcript_dedup"], 1)
    stages["transcript_dedup"] = tres.stats.get("stage_walls", {})

    # quality sidecar (UNTIMED — excluded from `value`): the perf artifact
    # carries this round's recall/precision so BENCH_r{N}.json can't
    # drift from the quality gates (VERDICT.md r4 item 9).
    quality = _quality(spark, sf_dir, tres)
    turns.unpersist()

    # 3. relational representatives
    timed("q1_pricing_summary", lambda: E.q1_pricing_summary(spark, sf_dir).collect())
    timed("q3_top_revenue_orders", lambda: E.q3_top_revenue_orders(spark, sf_dir).collect())
    timed("window_top2_per_order", lambda: E.window_top2_per_order(spark, sf_dir).count())
    timed("events_burst_pairs", lambda: E.events_burst_pairs(spark, sf_dir).collect())

    # 4. similarity search
    timed(
        "embedding_topk_neighbors",
        lambda: E.embedding_topk_neighbors(spark, sf_dir).count(),
    )

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_workloads_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "extras": extras,
        "stages": stages,
        "raw_walls": raw_walls,
        "quality": quality,
        "bench_runs_per_query": BENCH_RUNS,
        "cpus": CPUS,
    }


def _quality(spark, sf_dir: str, tres) -> dict:
    """Round quality pin: (a) e2e planted-truth recall/precision of the
    transcript pipeline result just benchmarked, (b) per-channel
    exactness vs brute-force ground truth on the sf0.01 documents slice
    (the full-audit protocol of tools/channel_audit.py at a size that
    keeps the bench wall bounded; the sf0.1 audit remains the deep
    gate in pytest/tools)."""
    from pyspark.sql import functions as F

    from hsip.audit import audit_channels
    from hsip.config import DedupConfig
    from hsip.fixtures.gen import gen_transcripts, to_spark, truth_pairs
    from hsip.recall import (
        adjusted_rand,
        bcubed_scores,
        cluster_pairs,
        evaluate_pairs,
    )

    out: dict = {}
    gen = gen_transcripts(seed=42, n_base=N_BASE)
    _, truth = to_spark(spark, gen)
    ours = cluster_pairs(tres.clusters).cache()
    tp = truth_pairs(truth).cache()
    ev, _missed = evaluate_pairs(ours, tp)
    out["transcript_e2e"] = {
        "recall": round(ev.recall, 6),
        "precision": round(ev.precision, 6),
        "truth_pairs": ev.n_truth,
        "our_pairs": ev.n_ours,
    }
    ours.unpersist(), tp.unpersist()

    # cluster-LEVEL agreement vs planted truth (item-weighted B-cubed +
    # chance-corrected ARI — recall.py): pair metrics over-weight big
    # clusters quadratically, so these catch a different failure shape.
    # gt_cluster is already the right partition as-is: hotband convs
    # (shared boilerplate, NOT duplicates) each carry their own conv_id
    # as gt_cluster — singleton labels by construction (fixtures/gen.py).
    truth_labels = truth.select(
        F.col("conv_id").alias("id"), F.col("gt_cluster").alias("cluster_id")
    )
    bc = bcubed_scores(tres.clusters, truth_labels).collect()[0]
    ar = adjusted_rand(tres.clusters, truth_labels).collect()[0]
    out["transcript_e2e"].update(
        bcubed_precision=bc.bcubed_precision,
        bcubed_recall=bc.bcubed_recall,
        bcubed_f1=bc.bcubed_f1,
        ari=ar.ari,
    )

    audit_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if not os.path.isdir(audit_dir):
        audit_dir = sf_dir
    docs = spark.read.parquet(os.path.join(audit_dir, "documents.parquet")).cache()
    res = audit_channels(docs, "doc_id", "text", DedupConfig(jaccard_threshold=0.7))
    out["channels"] = {
        ch: {
            "recall": round(r["recall"], 6),
            "precision": round(r["precision"], 6),
            "n_got": r["n_got"],
            "n_truth": r["n_truth"],
        }
        for ch, r in res.items()
    }
    out["channels_sf"] = audit_dir.rstrip("/").split("sf")[-1]
    docs.unpersist()
    return out


def main():
    from hsip.session import get_spark

    spark = get_spark(app_name="hsip-bench", master=f"local[{CPUS}]")
    try:
        result = run(spark, SF_DIR)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
