"""Iceberg table IO — gated behind runtime availability.

The production target (BASELINE.json input_hint) is an Iceberg table of
transcripts partitioned by ``bucket(conv_id, N)``; this sandbox image
has no Iceberg runtime jars, so every entry point probes for the
catalog and falls back to parquet.  The rest of the engine is
format-agnostic: it consumes/produces DataFrames, and the checkpoint
lineage uses ``snapshot_id`` (real Iceberg snapshot ids when available,
an input-file hash otherwise — plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    # Class.forName raises when the class is absent; a bare
    # `_jvm.org.apache.iceberg.Table` would NOT (py4j returns a silent
    # JavaPackage proxy for any unresolved path)
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str, fallback_path: str | None = None) -> DataFrame:
    """Read an Iceberg table by identifier; parquet fallback by path."""
    if iceberg_available(spark):
        return spark.read.format("iceberg").load(identifier)
    if fallback_path is None:
        raise RuntimeError(
            f"Iceberg runtime not on the classpath and no fallback_path for {identifier}"
        )
    return spark.read.parquet(fallback_path)


def current_snapshot_id(spark: SparkSession, identifier: str) -> str | None:
    """Iceberg snapshot id for checkpoint lineage (None when unavailable)."""
    if not iceberg_available(spark):
        return None
    row = spark.sql(
        f"SELECT snapshot_id FROM {identifier}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).first()
    return str(row[0]) if row else None


def write_table(df: DataFrame, identifier: str, fallback_path: str | None = None,
                mode: str = "append") -> None:
    if iceberg_available(df.sparkSession):
        df.writeTo(identifier).append() if mode == "append" else df.writeTo(identifier).createOrReplace()
        return
    if fallback_path is None:
        raise RuntimeError("no Iceberg runtime and no fallback_path")
    df.write.mode(mode if mode != "append" else "append").parquet(fallback_path)
