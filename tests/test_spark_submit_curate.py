"""jobs/curate.py through the real deployment shape: `spark-submit
--py-files hsip.zip` against multi-process local-cluster executors.

The in-process test (test_curate_job.py) pins the stage wiring and the
decontamination semantics; this one pins the SUBMIT surface — the full
curation composition must survive the shipped-zip import path in
foreign executor JVMs, and the funnel line it prints must agree with
the tables it wrote.
"""

import json
import os
import subprocess
import sys

import pytest

from hsip.fixtures.gen import gen_transcripts, to_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str | None:
    cand = os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
    return cand if os.access(cand, os.X_OK) else None


def test_spark_submit_curate_full_path(spark, tmp_path):
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("no spark-submit binary on this host")

    gen = gen_transcripts(seed=23, n_base=30)
    turns, _truth = to_spark(spark, gen)
    input_dir = str(tmp_path / "turns")
    turns.write.parquet(input_dir)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from build_pyfiles import build

    zip_path = build(str(tmp_path / "hsip.zip"))
    wh = str(tmp_path / "wh")

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("HSIP_MASTER", None)

    cmd = [
        submit,
        "--master", "local-cluster[2,2,2048]",
        "--driver-memory", "4g",
        "--conf", "spark.executor.memory=1g",
        "--conf", "spark.sql.shuffle.partitions=16",
        "--conf", "spark.locality.wait=0s",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "curate.py"),
        "--input", input_dir,
        "--warehouse", wh,
        "--run-id", "csmoke",
        "--min-substr-len", "100",
        "--seq-len", "512",
        "--n-shards", "4",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd=str(tmp_path)
    )
    if out.returncode != 0:
        tail = "\n".join((out.stderr or "").splitlines()[-60:])
        raise AssertionError(f"spark-submit failed ({out.returncode}):\n{tail}")

    funnel = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.strip()][-1])
    assert funnel["run_id"] == "csmoke"
    assert funnel["n_after_dedup"] < funnel["n_convs"]
    assert 0 < funnel["n_after_quality"] <= funnel["n_after_dedup"]
    assert sum(funnel["split_counts"].values()) == funnel["n_after_quality"]

    # funnel counts agree with the tables the run wrote
    corpus = spark.read.parquet(
        os.path.join(wh, "out", "csmoke", "corpus", "data"))
    assert corpus.count() == funnel["n_after_quality"]
    packing = spark.read.parquet(
        os.path.join(wh, "out", "csmoke", "packing", "data"))
    n_seq = packing.select("shard", "seq_id").distinct().count()
    assert n_seq == funnel["n_train_sequences"] > 0
    reps = spark.read.parquet(
        os.path.join(wh, "out", "csmoke", "representatives", "data"))
    assert reps.count() == funnel["n_after_dedup"]
