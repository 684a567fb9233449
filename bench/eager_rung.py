"""Round-6 eager-path validation rung: run_transcripts on the 554k-turn
corpus (n_base=20000 -> ~28.9k convs, ABOVE eager_barrier_min_docs so the
scale-mode physical plans run). Prints wall, stage walls, and a
label-exact checksum of the cluster table for cross-tree comparison.

Usage: python bench/eager_rung.py [n_base]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

REPO = os.getcwd()
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
CACHE = os.path.join("/root/repo", ".bench_cache", f"transcripts_n{N_BASE}")


def ensure_corpus() -> str:
    if not os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        from hsip.fixtures.gen import gen_transcripts

        os.makedirs(CACHE, exist_ok=True)
        gen = gen_transcripts(seed=42, n_base=N_BASE)
        pdf = gen.transcripts
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(os.path.join(CACHE, "part0.parquet"), index=False)
        with open(os.path.join(CACHE, "_SUCCESS"), "w") as f:
            f.write("ok")
    return CACHE


def main() -> None:
    from pyspark.sql import functions as F

    from hsip import schemas
    from hsip.config import DedupConfig
    from hsip.pipeline import run_transcripts
    from hsip.session import get_spark

    path = ensure_corpus()
    spark = get_spark(app_name="eager-rung", master=f"local[{CPUS}]")
    turns = spark.read.schema(schemas.TRANSCRIPTS).parquet(path)
    n_turns = turns.cache().count()
    t0 = time.time()
    res = run_transcripts(spark, turns, DedupConfig())
    wall = round(time.time() - t0, 3)
    chk = res.clusters.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("id", "cluster_id").cast("decimal(38,0)")
        ).cast("string").alias("h"),
    ).collect()[0]
    out = {
        "n_base": N_BASE, "n_turns": n_turns, "wall_s": wall,
        "stage_walls": res.stats.get("stage_walls", {}),
        "eager_barriers": res.stats.get("eager_barriers"),
        "n_rows": chk["n"], "label_checksum": chk["h"],
        "duplicate_pairs": res.stats.get("duplicate_pairs"),
        "verified_candidates": res.stats.get("verified_candidates"),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
