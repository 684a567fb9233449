"""Per-channel exactness audit on the ``documents`` fixture.

For each candidate channel, computes EXACT ground truth with brute force
(no LSH, no sampling) and reports the channel's recall/precision against
it:

  minhash_lsh — exact 5-gram shingle Jaccard >= threshold. Brute force
                via a token-Jaccard >= 0.5 superset (token Jaccard only
                drops slower than shingle Jaccard under edits, so the
                superset is safe for shingle thresholds >= 0.7).
  simhash     — exact Hamming <= d over all fingerprint pairs (numpy).
  substr      — exact common-substring >= L via the corpus suffix-array
                oracle (duplicate_spans_local).

Usage: python tools/channel_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hsip.config import DedupConfig  # noqa: E402
from hsip.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="channel-audit", master="local[16]")
    cfg = DedupConfig(jaccard_threshold=0.7)

    import pyspark.sql.functions as F

    from hsip import verify as V
    from hsip.lsh import lsh_candidates
    from hsip.simhash import simhash_candidates
    from hsip.suffixes import (
        duplicate_spans_local,
        fingerprint_table,
        substr_candidates,
        verify_substr,
    )
    from hsip.textkernel import featurize

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    feats = featurize(docs, "doc_id", "text", cfg).cache()
    rows = feats.select("id", "shingles", "simhash").collect()
    ids = [r.id for r in rows]
    sh = {r.id: set(r.shingles) for r in rows}
    sim = np.array([r.simhash for r in rows], dtype=np.int64).view(np.uint64)

    # ---- channel outputs -------------------------------------------------
    t0 = time.time()
    lsh_pairs, _ = lsh_candidates(feats.select("id", "sig"), cfg)
    vj = V.verify_jaccard(lsh_pairs, feats.select("id", "shingles"), cfg)
    got_j = {(r.a, r.b) for r in vj.filter("verdict").collect()}

    sp, _ = simhash_candidates(feats.select("id", "simhash"), cfg)
    vh = V.verify_hamming(sp, feats.select("id", "simhash"), cfg)
    got_h = {(r.a, r.b) for r in vh.filter("verdict").collect()}

    fps = fingerprint_table(docs, "doc_id", "text", cfg).cache()
    sub_pairs, _ = substr_candidates(fps, cfg)
    vs = verify_substr(sub_pairs, docs, "doc_id", "text", cfg)
    got_s = {(r.a, r.b) for r in vs.filter("verdict").collect()}
    print(f"channel outputs in {time.time()-t0:.0f}s: "
          f"jaccard={len(got_j)} hamming={len(got_h)} substr={len(got_s)}")

    # ---- exact truths ----------------------------------------------------
    # 1. shingle Jaccard via token-jaccard superset
    t0 = time.time()
    toks = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.array_distinct(
            F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ")
        ).alias("t"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    superset = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            "a.id", "b.id",
            (F.size(F.array_intersect("a.t", "b.t"))
             / F.size(F.array_union("a.t", "b.t"))).alias("tj"),
        )
        .filter(F.col("tj") >= 0.5)
        .collect()
    )
    truth_j = set()
    for r in superset:
        x, y = r[0], r[1]
        inter = len(sh[x] & sh[y])
        uni = len(sh[x] | sh[y])
        if uni and inter / uni >= cfg.jaccard_threshold:
            truth_j.add((min(x, y), max(x, y)))
    print(f"exact shingle-jaccard>= {cfg.jaccard_threshold}: {len(truth_j)} "
          f"(superset {len(superset)}) in {time.time()-t0:.0f}s")

    # 2. Hamming <= d, brute force
    t0 = time.time()
    n = len(sim)
    truth_h = set()
    for i in range(n):
        x = sim[i] ^ sim[i + 1 :]
        hams = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
        close = np.nonzero(hams <= cfg.hamming_d)[0]
        for j in close:
            p, q = ids[i], ids[i + 1 + int(j)]
            truth_h.add((min(p, q), max(p, q)))
    print(f"exact hamming<={cfg.hamming_d}: {len(truth_h)} in {time.time()-t0:.0f}s")

    # 3. substring >= L via suffix-array oracle
    t0 = time.time()
    texts = {
        str(r.doc_id): " ".join(str(r.text or "").lower().split())
        for r in docs.collect()
    }
    spans = duplicate_spans_local(texts, cfg.min_substr_len)
    truth_s = {(min(x, y), max(x, y)) for x, y, _ in spans}
    print(f"exact substr>={cfg.min_substr_len}: {len(truth_s)} in {time.time()-t0:.0f}s")

    def report(name, got, truth):
        hit = len(got & truth)
        rec = hit / len(truth) if truth else 1.0
        prec = hit / len(got) if got else 1.0
        print(f"{name}: recall={rec:.4f} precision={prec:.4f} "
              f"(got {len(got)}, truth {len(truth)}, missed {len(truth - got)})")
        for miss in sorted(truth - got)[:5]:
            print("   missed:", miss)

    report("minhash_lsh", got_j, truth_j)
    report("simhash    ", got_h, truth_h)
    report("substr     ", got_s, truth_s)
    spark.stop()


if __name__ == "__main__":
    main()
