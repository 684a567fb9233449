"""Round-6 rung profiler: eager_rung (554k turns, above the barrier)
with the event log on, decomposed into per-stage task metrics so stage
walls can be attributed to executor compute vs shuffle vs scheduling
(guide §1.1/§7.1). Does NOT touch bench.py (frozen).

Usage: python bench/profile_rung.py [n_base]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
EVDIR = os.environ.get("HSIP_EVLOG_DIR", "/tmp/evlog_rung")


def main() -> None:
    os.makedirs(EVDIR, exist_ok=True)
    from pyspark.sql import functions as F

    from hsip import schemas
    from hsip.config import DedupConfig
    from hsip.pipeline import run_transcripts
    from hsip.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from eager_rung import ensure_corpus  # noqa: E402

    path = ensure_corpus()
    spark = get_spark(
        app_name="rung-profile",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    app_id = spark.sparkContext.applicationId
    turns = spark.read.schema(schemas.TRANSCRIPTS).parquet(path)
    turns.cache().count()
    t0 = time.time()
    res = run_transcripts(spark, turns, DedupConfig())
    wall = round(time.time() - t0, 3)
    chk = res.clusters.agg(
        F.sum(F.xxhash64("id", "cluster_id").cast("decimal(38,0)")).cast("string")
    ).collect()[0][0]
    stage_walls = res.stats.get("stage_walls", {})
    spark.stop()

    evp = os.path.join(EVDIR, app_id)
    if not os.path.exists(evp):
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        parts = [p for p in os.listdir(d) if p.startswith("events_")]
        evp = os.path.join(d, sorted(parts)[0])

    # per-stage aggregation from task-end events
    stages: dict[int, dict] = {}
    jobs: dict[int, dict] = {}
    stage_job: dict[int, int] = {}
    with open(evp) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get("spark.job.description", "")[:60],
                    "t0": ev["Submission Time"],
                }
                for si in ev.get("Stage Infos", []):
                    stage_job[si["Stage ID"]] = jid
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {})
                st["name"] = si["Stage Name"][:40]
                st["wall"] = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3
                st["tasks"] = si["Number of Tasks"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                tm = ev.get("Task Metrics") or {}
                st["run"] = st.get("run", 0) + tm.get("Executor Run Time", 0) / 1e3
                st["cpu"] = st.get("cpu", 0) + tm.get("Executor CPU Time", 0) / 1e9
                st["deser"] = st.get("deser", 0) + tm.get("Executor Deserialize Time", 0) / 1e3
                st["gc"] = st.get("gc", 0) + tm.get("JVM GC Time", 0) / 1e3
                srm = tm.get("Shuffle Read Metrics") or {}
                st["sh_read_mb"] = st.get("sh_read_mb", 0) + (
                    srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                ) / 1e6
                st["fetch_wait"] = st.get("fetch_wait", 0) + srm.get("Fetch Wait Time", 0) / 1e3
                swm = tm.get("Shuffle Write Metrics") or {}
                st["sh_write_mb"] = st.get("sh_write_mb", 0) + swm.get("Shuffle Bytes Written", 0) / 1e6
                st["sh_write_t"] = st.get("sh_write_t", 0) + swm.get("Shuffle Write Time", 0) / 1e9
                dur = (ev["Task Info"]["Finish Time"] - ev["Task Info"]["Launch Time"]) / 1e3
                st["max_task"] = max(st.get("max_task", 0), dur)
                st["launch0"] = min(st.get("launch0", 1e18), ev["Task Info"]["Launch Time"])
                st["finishN"] = max(st.get("finishN", 0), ev["Task Info"]["Finish Time"])

    print(json.dumps({"wall_s": wall, "stage_walls": stage_walls, "checksum": chk}))
    print(f"{'sid':>4} {'job':>3} {'wall':>7} {'span':>7} {'ntask':>5} {'run_sum':>8} "
          f"{'cpu_sum':>8} {'maxT':>6} {'gc':>5} {'shR MB':>7} {'fwait':>6} {'shW MB':>7} name/jobdesc")
    for sid in sorted(stages):
        st = stages[sid]
        if "wall" not in st:
            continue
        jid = stage_job.get(sid, -1)
        desc = jobs.get(jid, {}).get("desc", "")
        span = (st.get("finishN", 0) - st.get("launch0", 0)) / 1e3 if st.get("finishN") else 0.0
        print(
            f"{sid:>4} {jid:>3} {st['wall']:>7.2f} {span:>7.2f} {st.get('tasks', 0):>5} "
            f"{st.get('run', 0):>8.2f} {st.get('cpu', 0):>8.2f} {st.get('max_task', 0):>6.2f} "
            f"{st.get('gc', 0):>5.2f} {st.get('sh_read_mb', 0):>7.1f} {st.get('fetch_wait', 0):>6.2f} "
            f"{st.get('sh_write_mb', 0):>7.1f} {st['name'][:24]} | {desc[:40]}"
        )
    print(f"event log: {evp}")


if __name__ == "__main__":
    main()
