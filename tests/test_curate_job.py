"""End-to-end smoke of jobs/curate.py — the full curation composition
(dedup -> quality -> decontam -> splits -> packing) in one driver.

Each stage's operator is oracle-verified on its own (see COVERAGE.md);
this test pins the WIRING: stage outputs feed the next stage's input,
the funnel counts are mutually consistent, every output table lands in
the warehouse, and a planted contaminated eval doc actually removes the
matching training doc from the corpus between two otherwise-identical
runs (dedup + quality are deterministic, so run2 - run1 isolates the
decontamination stage).
"""

import importlib.util
import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from hsip.fixtures.gen import gen_transcripts, to_spark
from hsip.reassemble import dedupe_turn_versions, reassemble

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_curate():
    spec = importlib.util.spec_from_file_location(
        "curate_job", os.path.join(REPO, "jobs", "curate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(curate, capsys, argv):
    curate.main(argv)
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def test_curate_job_funnel_and_decontam(spark, tmp_path, capsys):
    curate = _load_curate()

    gen = gen_transcripts(seed=11, n_base=40)
    turns, _truth = to_spark(spark, gen)
    input_dir = str(tmp_path / "turns")
    turns.write.parquet(input_dir)
    wh = str(tmp_path / "wh")

    base_argv = [
        "--input", input_dir, "--warehouse", wh,
        "--min-substr-len", "100", "--seq-len", "512", "--n-shards", "4",
    ]

    # ---- run 1: no decontamination
    f1 = _run(curate, capsys, base_argv + ["--run-id", "r1"])
    assert f1["n_after_dedup"] < f1["n_convs"]  # planted dups collapsed
    assert 0 < f1["n_after_quality"] <= f1["n_after_dedup"]
    assert f1["n_contaminated"] == 0
    assert sum(f1["split_counts"].values()) == f1["n_after_quality"]
    assert f1["n_train_sequences"] > 0

    # every stage table landed under the warehouse
    for table in ("clusters", "representatives", "curation",
                  "corpus", "packing"):
        path = os.path.join(wh, "out", "r1", table, "data")
        assert spark.read.parquet(path).count() > 0, table

    corpus1 = spark.read.parquet(os.path.join(wh, "out", "r1", "corpus", "data"))
    assert set(corpus1.columns) >= {"conv_id", "bucket", "split"}

    # packing invariants: offsets within the sequence, tokens accounted
    packing1 = spark.read.parquet(os.path.join(wh, "out", "r1", "packing", "data"))
    bad = packing1.filter(
        (F.col("offset") < 0) | (F.col("offset") >= 512)
        | (F.col("n_tokens") <= 0) | (F.col("shard") >= 4)).count()
    assert bad == 0

    # ---- run 2: eval set = the verbatim text of one surviving train doc
    victim = (corpus1.filter(F.col("split") == "train")
              .select("conv_id").orderBy("conv_id").first()["conv_id"])
    docs = reassemble(dedupe_turn_versions(spark.read.parquet(input_dir)))
    victim_text = docs.filter(F.col("conv_id") == victim).first()["doc_text"]
    assert len(victim_text) >= 100
    evals_dir = str(tmp_path / "evals")
    spark.createDataFrame([
        Row(eval_id="bench-0", text=victim_text),
        Row(eval_id="bench-1", text="unrelated benchmark prompt xyzzy " * 30),
    ]).write.parquet(evals_dir)

    # run 2 also lists the splits out of order: stage 5 must still pack
    # the split NAMED train, not whichever happens to be listed first
    f2 = _run(curate, capsys,
              base_argv + ["--run-id", "r2", "--eval-input", evals_dir,
                           "--splits", "val:5,train:90,test:5"])

    # dedup + quality stages are deterministic under identical input/config
    assert f2["n_after_dedup"] == f1["n_after_dedup"]
    assert f2["n_after_quality"] == f1["n_after_quality"]
    # the planted eval copy is caught and the doc leaves the corpus
    assert f2["n_contaminated"] >= 1
    assert sum(f2["split_counts"].values()) == (
        f2["n_after_quality"] - f2["n_contaminated"])
    corpus2 = spark.read.parquet(os.path.join(wh, "out", "r2", "corpus", "data"))
    assert corpus2.filter(F.col("conv_id") == victim).count() == 0

    # packing covers exactly the train split (not the first-listed val)
    packing2 = spark.read.parquet(
        os.path.join(wh, "out", "r2", "packing", "data"))
    n_train2 = corpus2.filter(F.col("split") == "train").count()
    assert packing2.count() == n_train2 > 0

    # evidence table names the victim against the planted eval doc
    evidence = spark.read.parquet(
        os.path.join(wh, "out", "r2", "contaminated", "data"))
    hit = evidence.filter((F.col("train_id") == victim)
                          & (F.col("eval_id") == "bench-0"))
    assert hit.count() >= 1
    assert hit.agg(F.min("substr_len")).first()[0] >= 100
