"""The full validation pass: per-turn rules + dataset constraints +
checkpointed, resumable writes.  This is the job `spark-submit` runs.

One pass over the transcripts table computes (north star):

1. per-turn rule violations + normalized columns  (single projection)
2. per-partition pass/fail summary                (one groupBy)
3. uniqueness of (conv_id, turn_idx)              (salted two-stage agg)
4. referential conv_id ⋉ conversations            (broadcast anti join)
5. ts-ordering per conversation                   (window after
                                                   repartition(conv_id))
6. role/tool frequency + text-length drift vs a checkpointed baseline
   (KL + PSI on small aggregated profiles)
7. checkpoint commit with lineage (snapshot, rule-schema hash) so a
   killed job restarts only unvalidated partitions
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import errors as E
from .engine import SparkValidator
from .operators import dataset as D
from .plans.checkpoint import CheckpointStore, part_id_col, snapshot_id


@dataclass
class RunConfig:
    out_dir: str
    n_parts: int = 64
    key_cols: tuple = ("conv_id", "turn_idx")
    conv_col: str = "conv_id"
    order_col: str = "turn_idx"
    ts_col: str = "ts"
    psi_threshold: float = 0.2
    write_annotated: bool = False
    resume: bool = True
    # Caching the annotated frame is a pessimization here: materializing
    # 6M+ rows of array<struct> into the object cache measured ~25x the
    # cost of recomputing the codegen projection from the columnar scan,
    # and a cached plan defeats column pruning for the narrow dataset
    # checks (uniqueness needs 2 columns, ordering 3).  Set True only
    # when the input scan itself is the expensive part AND executors
    # have cache headroom.
    persist: bool = False
    extra: dict = field(default_factory=dict)


@dataclass
class RunReport:
    n_turns: int
    n_failed: int
    n_rule_violations: int
    n_unique_violations: int
    n_orphan_violations: int
    n_ordering_violations: int
    drift: list
    skipped_partitions: int


class ValidationRun:
    def __init__(self, schema: dict, config: RunConfig, **validator_kw):
        self.validator = SparkValidator(schema, key_cols=config.key_cols, **validator_kw)
        self.config = config

    # ------------------------------------------------------------------

    def execute(self, df: DataFrame, conversations: DataFrame | None = None) -> RunReport:
        cfg = self.config
        spark = df.sparkSession
        os.makedirs(cfg.out_dir, exist_ok=True)
        store = CheckpointStore(spark, os.path.join(cfg.out_dir, "checkpoint"))
        snap = snapshot_id(df)
        shash = self.validator.schema_hash
        # lineage: the predicate set identifies WHAT this run checks, so a
        # config change (e.g. different key columns) invalidates resume state
        predicate_set = json.dumps(
            {"keys": list(cfg.key_cols), "conv": cfg.conv_col,
             "order": cfg.order_col, "ts": cfg.ts_col, "n_parts": cfg.n_parts},
            sort_keys=True,
        )

        # -- resume: prune already-validated partitions -------------------
        df = df.withColumn("part_id", part_id_col(cfg.conv_col, cfg.n_parts))
        skipped = 0
        if cfg.resume:
            done = store.done_partitions(snap, shash, predicate_set)
            if done:
                skipped = len(done)
                df = df.filter(~F.col("part_id").isin(done))

        # -- 1. per-turn validation — the compiled projection is evaluated
        # EXACTLY ONCE (feeding the violations write); the summary is
        # derived from the written violations plus a narrow row count, and
        # the dataset checks read only the raw columns they need (column
        # pruning reaches the scan).  Re-evaluating annotate per consumer
        # or caching it both measured strictly worse (see RunConfig.persist).
        annotated = self.validator.annotate(df)
        if cfg.persist:
            annotated.persist()
        try:
            keys = list(cfg.key_cols)

            # -- 2. rule violations (the one annotate evaluation) ----------
            viol = annotated.select(
                *keys, "part_id", F.explode("violations").alias("v")
            ).select(*keys, "part_id", "v.*")
            viol.write.mode("overwrite").parquet(os.path.join(cfg.out_dir, "violations"))

            # per-partition summary: the second (and last) evaluation of the
            # projection — failed ROWS cannot be recovered from the
            # violations table alone because (conv_id, turn_idx) keys are
            # not unique (that's what the uniqueness check finds)
            summary = annotated.groupBy("part_id").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((~F.col("passed")).cast("long")).alias("n_failed"),
                F.sum(F.size("violations").cast("long")).alias("n_violations"),
            )
            summary.persist()
            summary.write.mode("overwrite").parquet(os.path.join(cfg.out_dir, "summary"))

            if cfg.write_annotated:
                annotated.write.mode("overwrite").partitionBy("part_id").parquet(
                    os.path.join(cfg.out_dir, "annotated")
                )

            # -- 3..5 dataset-level checks (narrow scans of the raw input) --
            uniq = D.uniqueness_violations(df, keys)
            orphans = (
                D.referential_violations(
                    df, conversations, cfg.conv_col, keys=keys
                )
                if conversations is not None
                else None
            )
            ordering = D.ordering_violations(
                df, cfg.conv_col, cfg.order_col, cfg.ts_col, keys=keys
            )
            ds_viol = uniq
            for extra in (orphans, ordering):
                if extra is not None:
                    ds_viol = ds_viol.unionByName(extra)
            ds_viol.write.mode("overwrite").parquet(
                os.path.join(cfg.out_dir, "dataset_violations")
            )
            # count per check from the written files — never re-execute
            # the uniqueness/join/window DAGs just for the report
            ds_counts = {
                int(r["code"]): int(r["n"])
                for r in spark.read.parquet(os.path.join(cfg.out_dir, "dataset_violations"))
                .groupBy("code").agg(F.count(F.lit(1)).alias("n")).collect()
            }

            # -- 6. drift vs checkpointed baseline (raw columns only) ------
            profiles = (
                D.categorical_profile(df, "role", "role")
                .unionByName(D.categorical_profile(df, "tool", "tool"))
                .unionByName(D.length_histogram_profile(df, "text", "text_len"))
            )
            baseline_path = os.path.join(cfg.out_dir, "baseline_stats")
            drift = []
            if os.path.exists(baseline_path):
                baseline = spark.read.parquet(baseline_path)
                drift = D.drift_metrics(profiles, baseline)
            else:
                profiles.write.mode("overwrite").parquet(baseline_path)

            # -- 7. checkpoint commit --------------------------------------
            store.commit(summary, snap, shash, predicate_set)

            totals = summary.agg(
                F.sum("n_rows"), F.sum("n_failed"), F.sum("n_violations")
            ).first()
            return RunReport(
                n_turns=int(totals[0] or 0),
                n_failed=int(totals[1] or 0),
                n_rule_violations=int(totals[2] or 0),
                n_unique_violations=ds_counts.get(E.NOT_UNIQUE.code, 0),
                n_orphan_violations=ds_counts.get(E.ORPHAN_REFERENCE.code, 0),
                n_ordering_violations=ds_counts.get(E.ORDERING_VIOLATION.code, 0),
                drift=drift,
                skipped_partitions=skipped,
            )
        finally:
            if cfg.persist:
                annotated.unpersist()
            try:
                summary.unpersist()
            except Exception:
                pass


def main():  # pragma: no cover — spark-submit entry point
    """spark-submit --py-files cerberus_spark.zip -m cerberus_spark.run"""
    import argparse

    from .sources.transcripts import TURN_SCHEMA, load

    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-parts", type=int, default=64)
    args = p.parse_args()

    spark = SparkSession.builder.appName("cerberus_spark.run").getOrCreate()
    t, c = load(spark, args.data_dir)
    run = ValidationRun(TURN_SCHEMA, RunConfig(out_dir=args.out_dir, n_parts=args.n_parts))
    report = run.execute(t, c)
    print(report)


if __name__ == "__main__":  # pragma: no cover
    main()
