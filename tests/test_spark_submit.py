"""The literal deployment shape from the spec: `spark-submit --py-files
hsip.zip jobs/dedupe.py` against a MULTI-PROCESS master
(local-cluster[2,2,...] — two separate executor JVMs whose Python
workers can only import hsip from the shipped zip, exactly like a real
YARN/K8s cluster). This is the one surface the in-process test suite
and the scaling harness (which addPyFile's the same zip from a python
driver) cannot cover: the actual submit binary, conf precedence from
--conf/--master, and the jobs/dedupe.py CLI end-to-end.

Also pins the get_spark submit-mode contract: under spark-submit
(PYSPARK_GATEWAY_PORT set) the factory must NOT override the submitted
master with local[*] and must respect --conf spark.sql.shuffle.partitions.
"""

import os
import subprocess
import sys

import pytest

from hsip.fixtures.gen import gen_transcripts, to_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str | None:
    for cand in (
        os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"),
    ):
        if os.access(cand, os.X_OK):
            return cand
    return None


def test_spark_submit_pyfiles_local_cluster(spark, tmp_path):
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("no spark-submit binary on this host")

    gen = gen_transcripts(seed=7, n_base=40)
    turns, _truth = to_spark(spark, gen)
    input_dir = str(tmp_path / "turns")
    turns.write.parquet(input_dir)
    n_convs = turns.select("conv_id").distinct().count()

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from build_pyfiles import build

    zip_path = build(str(tmp_path / "hsip.zip"))
    wh = str(tmp_path / "wh")

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # the job must get its master from spark-submit, not from the env
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
        os.path.join(REPO, "jobs", "dedupe.py"),
        "--input", input_dir,
        "--warehouse", wh,
        "--run-id", "smoke",
        # exercises the exact-collapse pre-pass through the submit path
        # AND its checkpointed stage (clusters are identical either way —
        # pinned by test_pipeline_e2e.py — so the assertions below hold)
        "--collapse-exact",
        # and the wide-fingerprint CLI wiring: the 128-bit two-lane
        # layout must survive the shipped-zip multi-process path too
        # (semantics pinned by tests/test_simhash128.py; planted copies
        # still cluster through the minhash/substr channels regardless)
        "--simhash-bits", "128",
        # tiered output: one extra table from the SAME verified pairs
        "--tiers", "0.5,0.9",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd=str(tmp_path)
    )
    if out.returncode != 0:
        tail = "\n".join((out.stderr or "").splitlines()[-60:])
        raise AssertionError(f"spark-submit failed ({out.returncode}):\n{tail}")

    assert "run_id=smoke" in out.stdout

    clusters = spark.read.parquet(
        os.path.join(wh, "out", "smoke", "clusters", "data")
    )
    reps = spark.read.parquet(
        os.path.join(wh, "out", "smoke", "representatives", "data")
    )
    assert clusters.count() == n_convs
    n_reps = reps.count()
    assert 0 < n_reps <= n_convs
    # planted near-duplicates must actually cluster: fewer keepers than docs
    assert n_reps < n_convs

    tiered = spark.read.parquet(
        os.path.join(wh, "out", "smoke", "tiered", "data")
    )
    assert tiered.count() == n_convs
    assert set(tiered.columns) == {"id", "cluster_t50", "cluster_t90"}
    # nesting: the aggressive tier can only merge what the strict tier
    # split — ids sharing a t90 label must share a t50 label
    from pyspark.sql import functions as F

    viol = (
        tiered.groupBy("cluster_t90")
        .agg(F.countDistinct("cluster_t50").alias("n50"))
        .filter(F.col("n50") > 1)
        .count()
    )
    assert viol == 0
