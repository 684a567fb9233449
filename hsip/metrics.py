"""S6 — lineage + metrics tables (BASELINE.json:6 "per-partition lineage
and metrics tables").

Metrics are driver-side scalars (counts, timings, truncation events —
"no silent caps"). Lineage is per-partition row accounting computed
distributed via spark_partition_id() — no mapPartitions, no collect of
row data. Both are append-only tables through the Catalog.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas
from .catalog import Catalog


class Recorder:
    def __init__(self, spark: SparkSession, catalog: Catalog | None, run_id: str):
        """``catalog=None`` keeps metrics in memory (no warehouse): callers
        without a persistent catalog — contract queries, tests — still get
        truncation accounting instead of dropping it ("no silent caps");
        read them back via ``recorded()``."""
        self.spark = spark
        self.catalog = catalog
        self.run_id = run_id
        self._metric_rows: list[tuple] = []

    def metric(self, stage: str, key: str, value: float) -> None:
        self._metric_rows.append(
            (self.run_id, stage, key, float(value), datetime.now(timezone.utc))
        )

    def recorded(self) -> dict[tuple[str, str], float]:
        """Unflushed metrics as {(stage, key): value} — in-memory view."""
        return {(s, k): v for (_rid, s, k, v, _ts) in self._metric_rows}

    def lineage(self, stage: str, df: DataFrame, fingerprint: str) -> None:
        """Per-partition output-row accounting for ``df`` (one action)."""
        if self.catalog is None:
            return
        rows = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.col("partition_id").cast("int"),
                F.col("rows").cast("long"),
                F.lit(fingerprint).alias("fingerprint"),
                F.current_timestamp().alias("finished_at"),
            )
        )
        self.catalog.write(rows, "lineage", mode="append")

    def flush(self) -> None:
        if not self._metric_rows or self.catalog is None:
            return
        df = self.spark.createDataFrame(self._metric_rows, schema=schemas.METRICS)
        self.catalog.write(df, "metrics", mode="append")
        self._metric_rows = []


class StageTimer:
    def __init__(self, rec: Recorder, stage: str):
        self.rec, self.stage = rec, stage

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.rec.metric(self.stage, "wall_sec", time.time() - self.t0)
        return False
