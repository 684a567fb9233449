"""Per-channel exactness audit on the ``documents`` fixture.

Thin CLI over hsip.audit (the shared logic is pytest-gated by
tests/test_channel_audit.py — VERDICT.md r3 item 4).

Usage: python tools/channel_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hsip.audit import audit_channels  # noqa: E402
from hsip.config import DedupConfig  # noqa: E402
from hsip.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="channel-audit", master="local[16]")
    cfg = DedupConfig(jaccard_threshold=0.7)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    t0 = time.time()
    results = audit_channels(docs, "doc_id", "text", cfg)
    for ch, r in results.items():
        print(f"{ch:12s}: recall={r['recall']:.4f} precision={r['precision']:.4f} "
              f"(got {r['n_got']}, truth {r['n_truth']})")
        for miss in r["missed"]:
            print("   missed:", miss)
        for sp in r["spurious"]:
            print("   spurious:", sp)
    print(f"audit wall: {time.time()-t0:.0f}s")
    spark.stop()


if __name__ == "__main__":
    main()
