"""N -> 4N scaling-efficiency protocol (BASELINE.md).

The driver-prescribed sandbox evidence for the "scaling efficiency >= 0.8
from N to 4N executors" criterion: the SAME job + input at local[8] and
local[32] (two parallelism levels on the 32-core host), reporting
throughput at both plus efficiency = (tput_32 / tput_8) / 4.

Usage: python bench/scaling.py [--n-base 20000] [--runs 1]
Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from hsip.session import get_spark
from hsip.config import DedupConfig
import pyspark.sql.functions as F
from hsip.pipeline import run_transcripts

spark = get_spark(master={master!r})
turns = spark.read.parquet({path!r})
turns = turns.select("conv_id", F.col("turn_idx").cast("int"), "role",
                     "text", "tool", F.col("ts").cast("timestamp")).cache()
n = turns.count()
t0 = time.time()
res = run_transcripts(spark, turns, DedupConfig())
res.clusters.count()
dt = time.time() - t0
print(json.dumps({{"turns": n, "wall_sec": dt}}))
spark.stop()
"""


def run_once(master: str, path: str) -> dict:
    code = _RUNNER.format(repo=REPO, master=master, path=path)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=20000)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    os.environ["HSIP_BENCH_NBASE"] = str(args.n_base)
    sys.path.insert(0, REPO)
    import bench

    path = bench._transcripts_path()

    # alternate levels and keep the BEST wall per level: the sandbox host
    # is shared (load avg 6-10 from other tenants with zero processes of
    # ours running), so min-of-N is the least-interfered measurement
    results = {}
    walls: dict[str, list] = {"local[8]": [], "local[32]": []}
    turns = 0
    for _ in range(args.runs):
        for master in ("local[8]", "local[32]"):
            r = run_once(master, path)
            walls[master].append(r["wall_sec"])
            turns = r["turns"]
    for master, ws in walls.items():
        best = min(ws)
        results[master] = {
            "turns": turns,
            "wall_sec": round(best, 1),
            "turns_per_sec": round(turns / best, 1),
            "all_walls": [round(w, 1) for w in ws],
        }

    t8 = results["local[8]"]["turns_per_sec"]
    t32 = results["local[32]"]["turns_per_sec"]
    eff = round((t32 / t8) / 4, 3)
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "levels": results,
        "n_base": args.n_base,
    }
    print(json.dumps(summary))
    # raw results land in a sidecar; BENCH/BASELINE.md carries the curated
    # analysis (saturation curve, event-log evidence) and is hand-edited
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_latest.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
