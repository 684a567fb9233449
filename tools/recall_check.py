"""End-to-end dup-pair recall vs planted ground truth at configurable
scale (BASELINE.json:2 acceptance: recall >= 0.99).

Usage: python tools/recall_check.py [n_base] [master]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hsip.config import DedupConfig  # noqa: E402
from hsip.fixtures.gen import gen_transcripts, to_spark, truth_pairs  # noqa: E402
from hsip.pipeline import run_transcripts  # noqa: E402
from hsip.recall import cluster_pairs, evaluate_pairs  # noqa: E402
from hsip.session import get_spark  # noqa: E402


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    master = sys.argv[2] if len(sys.argv) > 2 else "local[32]"
    spark = get_spark(app_name="recall-check", master=master)
    gen = gen_transcripts(seed=42, n_base=n_base)
    turns, truth = to_spark(spark, gen)
    turns = turns.cache()
    n = turns.count()
    t0 = time.time()
    res = run_transcripts(spark, turns, DedupConfig())
    ours = cluster_pairs(res.clusters).cache()
    tp = truth_pairs(truth).cache()
    ev, missed = evaluate_pairs(ours, tp)
    out = {
        "n_base": n_base,
        "turns": n,
        "recall": round(ev.recall, 6),
        "precision": round(ev.precision, 6),
        "truth_pairs": ev.n_truth,
        "our_pairs": ev.n_ours,
        "wall_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    if ev.recall < 0.99:
        print("MISSED EXAMPLES:", missed.limit(10).collect())
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
