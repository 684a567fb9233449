"""N -> 4N scaling-efficiency protocol (BASELINE.md).

The driver-prescribed sandbox evidence for the "scaling efficiency >= 0.8
from N to 4N executors" criterion: the SAME job + input at two
parallelism levels on the 32-core host, reporting throughput at both
plus efficiency = (tput_4N / tput_N) / 4. Two modes:

  --mode threads    local[8] vs local[32] — one JVM, shared heap/GC.
  --mode executors  local-cluster[2,4,mem] vs local-cluster[8,4,mem] —
                    true multi-process executors with isolated heaps,
                    the closest sandbox analogue of N -> 4N *executors*
                    (the criterion's actual unit; VERDICT.md r1 item 2).

Usage: python bench/scaling.py [--mode threads|executors] [--n-base 20000] [--runs 1]
Writes BENCH/scaling_latest.json / BENCH/scaling_executors_latest.json
and prints one JSON line; BENCH/BASELINE.md carries the curated analysis.
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
import os, sys, time, json
sys.path.insert(0, {repo!r})
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
from hsip.session import get_spark
from hsip.config import DedupConfig
import pyspark.sql.functions as F
from hsip.pipeline import run_transcripts

extra = {{}}
if {master!r}.startswith("local-cluster["):
    extra["spark.executor.memory"] = os.environ.get("HSIP_EXEC_MEM", "6g")
spark = get_spark(master={master!r}, extra_conf=extra)
if {master!r}.startswith("local-cluster["):
    # multi-process executors don't share the driver's sys.path: ship the
    # package exactly as spark-submit --py-files would (north_rule shape)
    from tools.build_pyfiles import build
    spark.sparkContext.addPyFile(build("/tmp/hsip_pyfiles.zip"))
turns = spark.read.parquet({path!r})
turns = turns.select("conv_id", F.col("turn_idx").cast("int"), "role",
                     "text", "tool", F.col("ts").cast("timestamp")).cache()
n = turns.count()
t0 = time.time()
cfg = DedupConfig(collapse_exact=bool(int(os.environ.get("HSIP_COLLAPSE_EXACT", "0"))))
res = run_transcripts(spark, turns, cfg)
res.clusters.count()
dt = time.time() - t0
print(json.dumps({{"turns": n, "wall_sec": dt,
                   "stage_walls": res.stats.get("stage_walls", {{}}),
                   "work": {{k: res.stats.get(k) for k in
                            ("n_docs", "verified_candidates",
                             "duplicate_pairs", "dup_pairs_by_channel")}}}}))
spark.stop()
"""


def run_once(master: str, path: str) -> dict:
    code = _RUNNER.format(repo=REPO, master=master, path=path)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    if out.returncode != 0:
        # surface the child's failure (OOM aborts etc.) instead of a bare
        # CalledProcessError with captured-and-dropped stderr
        sys.stderr.write(f"--- run_once({master}) FAILED, stderr tail ---\n")
        sys.stderr.write("\n".join(out.stderr.splitlines()[-150:]) + "\n")
        raise RuntimeError(f"scaling run failed at {master}")
    return json.loads(out.stdout.strip().splitlines()[-1])


# worker memory for local-cluster masters: must cover the executor it
# hosts (HSIP_EXEC_MEM) plus overhead. The N=1 rung caches the whole
# corpus on one executor, so this scales with corpus size (see sidecar
# note): 554k turns fit 6g/7168MB; 2.76M needs ~9g/10240MB.
_WMEM = os.environ.get("HSIP_WORKER_MEM_MB", "7168")

_MODES = {
    # mode -> (masterN, master4N, metric name, sidecar file)
    "threads": (
        "local[8]", "local[32]",
        "scaling_efficiency_8_to_32_threads", "scaling_latest.json",
    ),
    "executors": (
        f"local-cluster[2,4,{_WMEM}]", f"local-cluster[8,4,{_WMEM}]",
        "scaling_efficiency_2_to_8_executors", "scaling_executors_latest.json",
    ),
    # 1 -> 4 executors of 2 cores: the N->4N *executor* measurement whose
    # both levels fit inside this shared host's free cores (load avg of
    # other tenants ~8-16 of 32) — the 8->32-core levels time-slice
    # against co-tenants and measure the host, not the engine. See
    # BENCH/BASELINE.md.
    "executors1to4": (
        f"local-cluster[1,2,{_WMEM}]", f"local-cluster[4,2,{_WMEM}]",
        "scaling_efficiency_1_to_4_executors", "scaling_executors_1to4_latest.json",
    ),
    # 1-core executors, 1 -> 4: the only N->4N pair whose UPPER level
    # still fits under this host's measured ~6k turns/s memory-bandwidth
    # ceiling (local[8] == local[32] wall) — above it the host, not the
    # engine, bounds the ratio. See BENCH/BASELINE.md.
    "executors1c": (
        f"local-cluster[1,1,{_WMEM}]", f"local-cluster[4,1,{_WMEM}]",
        "scaling_efficiency_1c_1_to_4_executors", "scaling_executors_1c_latest.json",
    ),
    # WEAK scaling (VERDICT.md r3 item 1): fixed corpus-PER-EXECUTOR —
    # the N level runs n_base, the 4N level runs 4*n_base, so each
    # executor holds the same data at both rungs. This is the regime a
    # real N -> 4N growth operates in (you add executors because the data
    # grew; each executor's share, cache pressure, and task sizes stay
    # constant) — the strong-scaling rungs instead concentrate the WHOLE
    # corpus on one executor at N=1 (spill + 100% cache residency) and
    # shrink per-task work at 4N, two artifacts a deployment never sees.
    # Efficiency stays per-core-throughput ratio: tput_4N / (4 * tput_N),
    # which equals wall_N / wall_4N when the corpus ratio is exactly 4x.
    "weak1c": (
        f"local-cluster[1,1,{_WMEM}]", f"local-cluster[4,1,{_WMEM}]",
        "weak_scaling_efficiency_1c_1_to_4_executors", "scaling_weak_1c_latest.json",
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=sorted(_MODES), default="threads")
    ap.add_argument("--n-base", type=int, default=20000)
    ap.add_argument("--runs", type=int, default=1)
    # measure the exact-collapse pre-pass config (pipeline.py): same
    # protocol, sidecar suffixed so default-config readings are never
    # overwritten by collapse-config ones
    ap.add_argument("--collapse-exact", action="store_true")
    args = ap.parse_args()
    m_lo, m_hi, metric, sidecar = _MODES[args.mode]
    if args.collapse_exact:
        os.environ["HSIP_COLLAPSE_EXACT"] = "1"
        metric += "_collapse_exact"
        sidecar = sidecar.replace("_latest.json", "_collapse_latest.json")

    os.environ["HSIP_BENCH_NBASE"] = str(args.n_base)
    sys.path.insert(0, REPO)
    import bench

    # weak mode: corpus scales with executors (fixed data-per-executor);
    # strong modes: one corpus for both levels
    n_lo = args.n_base
    n_hi = 4 * args.n_base if args.mode.startswith("weak") else args.n_base
    bench.N_BASE = n_lo
    paths = {m_lo: bench._transcripts_path()}
    bench.N_BASE = n_hi
    paths[m_hi] = bench._transcripts_path()

    # alternate levels and keep the BEST wall per level: the sandbox host
    # is shared (load avg 6-10 from other tenants with zero processes of
    # ours running), so min-of-N is the least-interfered measurement
    results = {}
    walls: dict[str, list] = {m_lo: [], m_hi: []}
    turns_at: dict[str, int] = {}
    stage_walls: dict[str, dict] = {}
    work_at: dict[str, dict] = {}
    for i in range(args.runs):
        for master in (m_lo, m_hi):
            r = run_once(master, paths[master])
            walls[master].append(r["wall_sec"])
            turns_at[master] = r["turns"]
            # work counters are input-determined (identical across runs
            # of one level); keep the latest
            work_at[master] = r.get("work", {})
            # keep the stage decomposition of the BEST run per level so
            # the sidecar can attribute where a rung's wall actually goes
            if r["wall_sec"] == min(walls[master]):
                stage_walls[master] = r.get("stage_walls", {})
            # stream per-rung walls so a long ladder is observable mid-run
            sys.stderr.write(
                f"[scaling] run {i + 1}/{args.runs} {master}: "
                f"{r['turns']} turns, {r['wall_sec']:.1f}s\n"
            )
            sys.stderr.flush()
    for master, ws in walls.items():
        best = min(ws)
        results[master] = {
            "turns": turns_at[master],
            "wall_sec": round(best, 1),
            "turns_per_sec": round(turns_at[master] / best, 1),
            "all_walls": [round(w, 1) for w in ws],
            "stage_walls": stage_walls.get(master, {}),
            "work": work_at.get(master, {}),
        }

    t_lo = results[m_lo]["turns_per_sec"]
    t_hi = results[m_hi]["turns_per_sec"]
    # per-core-throughput ratio: for strong modes (same corpus) this is
    # the classic speedup/4; for weak mode (4x corpus at 4N) it equals
    # wall_N / wall_4N when the corpus ratio is exactly 4x
    eff = round((t_hi / t_lo) / 4, 3)
    # work-normalized efficiency (weak mode): candidate-pair throughput
    # ratio per core. Weak scaling fixes turns-per-executor but NOT
    # work-per-executor — near-dup candidate counts grow superlinearly
    # with corpus size on boilerplate-heavy corpora, so the 4x rung
    # verifies MORE pairs per turn than the 1x rung. When both levels
    # report pair counts, surface (pairs/s at 4N) / (4 * pairs/s at N)
    # so a wall-ratio drop attributable to work growth is visible in the
    # artifact itself rather than argued from the event log.
    eff_work = None
    c_lo = (work_at.get(m_lo) or {}).get("verified_candidates")
    c_hi = (work_at.get(m_hi) or {}).get("verified_candidates")
    if c_lo and c_hi:
        w_lo, w_hi = results[m_lo]["wall_sec"], results[m_hi]["wall_sec"]
        eff_work = round((c_hi / w_hi) / (4 * c_lo / w_lo), 3)
    summary = {
        "metric": metric,
        "value": eff,
        "unit": "ratio",
        "value_work_normalized": eff_work,
        "levels": results,
        "n_base": args.n_base,
        "n_base_hi": n_hi,
        # same per-executor memory at BOTH levels; the N=1 rung holds the
        # ENTIRE corpus's caches on one executor, so this must scale with
        # corpus-per-executor exactly as a real deployment would size it
        # (6g suffices at 554k turns; 2.76M needs ~9g at N=1)
        "executor_memory": os.environ.get("HSIP_EXEC_MEM", "6g"),
    }
    print(json.dumps(summary))
    # raw results land in a sidecar; BENCH/BASELINE.md carries the curated
    # analysis (saturation curve, event-log evidence) and is hand-edited
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", sidecar), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
