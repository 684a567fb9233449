"""Round-6 profiling harness: event-log job decomposition of the two
dedup workloads at bench scale (guide §1 — measure first).

Runs run_transcripts / run_documents ONCE each with the Spark event log
on, then parses the log into (job description, wall, task time) rows so
the per-stage walls in BENCH can be attributed to actual Spark jobs vs
driver gaps. Does NOT touch bench.py (frozen).

Usage: python bench/profile_pipeline.py [transcript|docs|both]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVDIR = os.environ.get("HSIP_EVLOG_DIR", "/tmp/evlog")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    os.makedirs(EVDIR, exist_ok=True)
    from hsip.session import get_spark

    spark = get_spark(
        app_name="hsip-profile",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            # plain-text log: the parser below reads it line-by-line
            "spark.eventLog.compress": "false",
        },
    )
    app_id = spark.sparkContext.applicationId
    from hsip import schemas
    from hsip.config import DedupConfig
    from hsip.pipeline import run_documents, run_transcripts

    walls = {}
    if which in ("docs", "both"):
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        t0 = time.time()
        res = run_documents(spark, docs, "doc_id", "text",
                            DedupConfig(jaccard_threshold=0.7))
        walls["doc_dedup_3ch"] = round(time.time() - t0, 3)
        walls["doc_stages"] = res.stats.get("stage_walls", {})
    if which in ("transcript", "both"):
        tpath = os.path.join(REPO, ".bench_cache", "transcripts_n2000")
        turns = spark.read.schema(schemas.TRANSCRIPTS).parquet(tpath)
        turns.cache().count()
        t0 = time.time()
        tres = run_transcripts(spark, turns, DedupConfig())
        walls["transcript_dedup"] = round(time.time() - t0, 3)
        walls["t_stages"] = tres.stats.get("stage_walls", {})
    spark.stop()

    # parse event log: job decomposition (Spark 4 writes a
    # eventlog_v2_<appId>/ dir of rolled files)
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        parts = [p for p in os.listdir(d) if p.startswith("events_")]
        path = os.path.join(d, sorted(parts)[0])
    jobs = {}
    stages = {}
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    )[:90],
                    "t0": ev["Submission Time"],
                    "n_stages": len(ev.get("Stage Infos", [])),
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"][:60],
                    "wall": (si.get("Completion Time", 0)
                             - si.get("Submission Time", 0)) / 1000.0,
                    "tasks": si["Number of Tasks"],
                }
    print(json.dumps(walls, indent=1))
    rows = sorted(jobs.items())
    prev_end = None
    total_gap = 0.0
    for jid, j in rows:
        wall = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        gap = (j["t0"] - prev_end) / 1000.0 if prev_end else 0.0
        # concurrent jobs (channel threads) produce negative gaps; zero them
        total_gap += max(gap, 0.0)
        prev_end = max(prev_end or 0, j.get("t1", j["t0"]))
        print(f"job {jid:3d}  wall {wall:7.2f}s  gap_before {gap:7.2f}s  "
              f"stages {j['n_stages']:2d}  {j['desc']}")
    print(f"TOTAL driver gap (idle between jobs): {total_gap:.2f}s")
    print(f"event log: {path}")


if __name__ == "__main__":
    main()
