"""The full validation pass: per-turn rules + dataset constraints +
checkpointed, resumable writes.  This is the job `spark-submit` runs.

One pass over the transcripts table computes (north star):

1. per-turn rule violations + normalized columns  (single projection)
2. per-partition pass/fail summary                (one groupBy)
3. uniqueness of (conv_id, turn_idx)              (salted two-stage agg)
4. referential conv_id ⋉ conversations            (anti join, AQE-chosen)
5. ts-ordering per conversation                   (window after
                                                   repartition(conv_id))
6. role/tool frequency + text-length drift vs a checkpointed baseline
   (KL + PSI on small aggregated profiles)
6b. (optional, ``RunConfig.sequence_rules``) conversation-sequence
   grammar — first-role / role-transitions / turn_idx contiguity / ts
   monotonicity in one window pass (operators/sequence.py)
7. checkpoint commit with lineage (snapshot, rule-schema hash) so a
   killed job restarts only unvalidated partitions

Resume correctness invariants:

* per-row outputs (violations, summary) are written partitioned by
  ``part_id`` with DYNAMIC partition overwrite — a resumed run that
  processes only pending partitions replaces only those partition
  directories; previously committed partitions' data is untouched.
  A FRESH single-wave run (nothing committed, one wave = all
  partitions) instead writes flat with ``part_id`` as a data column —
  identical schema to readers, none of the partitioned write's
  small-files/commit overhead; the selective-overwrite machinery only
  engages when there is prior committed state to preserve.
* checkpoint rows are committed per WAVE (``RunConfig.waves`` groups of
  partitions), each wave only after its outputs are durable — a killed
  job restarts from the last completed wave, never re-trusting
  half-written output.
* a fully-resumed run (every partition 'done') performs NO writes and
  reports from the durable summary — it cannot erase prior results.
* in-memory inputs have no stable lineage (snapshot_id() → None):
  resume is disabled for them and commits carry an ephemeral id that
  can never match a future run.
* dataset-level checks (uniqueness/referential/ordering/drift) are
  GLOBAL invariants — they always run over the full input (a
  partition-pruned uniqueness check would be wrong) and their sinks are
  plain overwrites.
"""

from __future__ import annotations

import hashlib
import json
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import errors as E
from .engine import SparkValidator
from .operators import dataset as D
from .plans.checkpoint import (CheckpointStore, fs_delete, fs_exists,
                               part_id_col, read_local_rows, snapshot_id)


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
    #: checkpoint granularity: partitions are processed in this many
    #: waves, each wave's checkpoint rows committed once its outputs are
    #: durable.  1 = single pass (minimum scans); raise it when restart
    #: cost dominates re-scan cost (very long jobs on flaky clusters).
    waves: int = 1
    # Caching the annotated frame is a pessimization here: materializing
    # 6M+ rows of array<struct> into the object cache measured ~25x the
    # cost of recomputing the codegen projection from the columnar scan,
    # and a cached plan defeats column pruning for the narrow dataset
    # checks (uniqueness needs 2 columns, ordering 3).  Set True only
    # when the input scan itself is the expensive part AND executors
    # have cache headroom.
    persist: bool = False
    #: optional conversation-sequence grammar (operators/sequence.py
    #: kwargs: first_roles / transitions / contiguous / monotone_ts /
    #: order_tie).  None (default) skips the check; when set, sequence
    #: violations join the dataset-violations sink and the report.
    sequence_rules: dict | None = None
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
    n_sequence_violations: int = 0


class ValidationRun:
    def __init__(self, schema: dict, config: RunConfig, **validator_kw):
        # part_id is engine plumbing, not document data: declaring it a key
        # column keeps it out of unknown-field validation and purge
        # (otherwise allow_unknown=False would flag it on every row).
        key_cols = tuple(config.key_cols)
        if "part_id" not in key_cols:
            key_cols = key_cols + ("part_id",)
        self.validator = SparkValidator(schema, key_cols=key_cols, **validator_kw)
        self.config = config

    # ------------------------------------------------------------------

    def _path(self, *parts: str) -> str:
        return "/".join([self.config.out_dir.rstrip("/"), *parts])

    def execute(self, df: DataFrame, conversations: DataFrame | None = None) -> RunReport:
        cfg = self.config
        spark = df.sparkSession
        store = CheckpointStore(spark, self._path("checkpoint"))
        snap = snapshot_id(df)
        resume_ok = cfg.resume and snap is not None
        if snap is None:
            # no stable lineage: never resumable, never matched by a later run
            snap = f"ephemeral-{uuid.uuid4().hex[:12]}"
        shash = self.validator.schema_hash
        # lineage: the predicate set identifies WHAT this run checks, so a
        # config change (e.g. different key columns) invalidates resume state
        predicate_set = json.dumps(
            {"keys": list(cfg.key_cols), "conv": cfg.conv_col,
             "order": cfg.order_col, "ts": cfg.ts_col, "n_parts": cfg.n_parts},
            sort_keys=True,
        )

        df = df.withColumn("part_id", part_id_col(cfg.conv_col, cfg.n_parts))
        done: list[int] = store.done_partitions(snap, shash, predicate_set) if resume_ok else []
        pending = [p for p in range(cfg.n_parts) if p not in set(done)]

        # Lineage id stamped onto every summary row.  Dynamic partition
        # overwrite only replaces partitions that have rows under the
        # CURRENT input — if an out_dir is reused with different data or a
        # different schema, a partition with zero rows now would keep the
        # OLD run's summary/violations rows on disk and the report/commit
        # reads would mix two datasets.  Two defenses: (a) when no
        # partition is committed for this lineage (fresh run or lineage
        # change) the output dirs are cleared up front; (b) report totals
        # and wave commits read only rows stamped with this lineage.
        lineage = hashlib.sha256(
            f"{snap}|{shash}|{predicate_set}".encode()
        ).hexdigest()[:16]
        if not done:
            for sub in ("summary", "violations", "annotated"):
                fs_delete(spark, self._path(sub))

        # The three pipelines below are independent DAGs (the dataset
        # checks and drift read the raw input, not the wave outputs).
        # Submitting them from separate driver threads lets the
        # scheduler overlap their jobs: at bench scale each job is
        # sub-second of compute behind ~0.5 s of fixed scheduling +
        # parquet-commit overhead, so sequential submission made the
        # orchestration — not the compute — the wall clock (6.6 s vs a
        # 0.32 s compute phase).  On a real cluster the same overlap
        # hides the small jobs' latency behind the big scan.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            fut_waves = pool.submit(
                self._run_validation_waves, df, done, pending, store, snap,
                shash, predicate_set, lineage,
            ) if pending else None
            fut_ds = pool.submit(self._run_dataset_checks, spark, df, conversations)
            fut_drift = pool.submit(self._run_drift, spark, df)
            try:
                if fut_waves is not None:
                    fut_waves.result()
                # fully resumed: zero writes — prior results stay durable
            except BaseException:
                # A failed run must not COMMIT a drift baseline: later
                # runs would silently compare against the profile of an
                # input that never validated (r4 ADVICE).  The drift
                # thread runs concurrently, so roll back its first-run
                # baseline write rather than trying to prevent it.
                try:
                    _, wrote_baseline = fut_drift.result()
                except Exception:
                    wrote_baseline = False
                if wrote_baseline:
                    fs_delete(spark, self._path("baseline_stats"))
                raise
            ds_counts = fut_ds.result()
            drift, _ = fut_drift.result()

        # -- report from the durable summary (covers all partitions,
        # this run's and previously committed ones alike).  An empty
        # input writes no summary part files (a partitioned write of
        # zero rows leaves only _SUCCESS), so fall back to zeros.
        # Local out_dirs sum the ≤ n_parts summary rows driver-side
        # (see _run_validation_waves — same rationale, same fallback).
        summary_rows = read_local_rows(
            spark, self._path("summary"),
            columns=["lineage", "n_rows", "n_failed", "n_violations"])
        if summary_rows is not None:
            if summary_rows and "lineage" in summary_rows[0]:
                summary_rows = [r for r in summary_rows
                                if r["lineage"] == lineage]
            totals = (
                sum(r["n_rows"] or 0 for r in summary_rows),
                sum(r["n_failed"] or 0 for r in summary_rows),
                sum(r["n_violations"] or 0 for r in summary_rows),
            )
        else:
            try:
                summary = spark.read.parquet(self._path("summary"))
                if "lineage" in summary.columns:
                    summary = summary.filter(F.col("lineage") == lineage)
                totals = (
                    summary
                    .agg(F.sum("n_rows"), F.sum("n_failed"),
                         F.sum("n_violations"))
                    .first()
                )
            except Exception:
                totals = (0, 0, 0)
        return RunReport(
            n_turns=int(totals[0] or 0),
            n_failed=int(totals[1] or 0),
            n_rule_violations=int(totals[2] or 0),
            n_unique_violations=ds_counts.get(E.NOT_UNIQUE.code, 0),
            n_orphan_violations=ds_counts.get(E.ORPHAN_REFERENCE.code, 0),
            n_ordering_violations=ds_counts.get(E.ORDERING_VIOLATION.code, 0),
            drift=drift,
            skipped_partitions=len(done),
            n_sequence_violations=ds_counts.get(E.SEQUENCE_VIOLATION.code, 0),
        )

    # ------------------------------------------------------------------

    def _run_validation_waves(self, df, done, pending, store, snap, shash,
                              predicate_set, lineage) -> None:
        cfg = self.config
        spark = df.sparkSession
        n_waves = max(1, min(cfg.waves, len(pending)))
        chunk = -(-len(pending) // n_waves)  # ceil
        waves = [pending[i:i + chunk] for i in range(0, len(pending), chunk)]

        # Fresh single-wave runs (nothing committed, one wave covering
        # every pending partition — the common batch case) write their
        # outputs FLAT: the part_id-dir layout exists so a RESUMED or
        # WAVED run can replace only its own partitions via dynamic
        # overwrite, but with done=[] and one wave that machinery cannot
        # trigger, and the partitioned write costs n_parts tiny files
        # plus a per-dir commit-rename pass (measured ~1 s of the wave
        # wall at 64 parts — guide §6's small-files anti-pattern).  The
        # flat write keeps part_id as a DATA column, so readers see the
        # identical schema either way.  Correctness of the mix: commit
        # is atomic (one appended file), so a later run sees either
        # done=[] (output dirs are cleared up front) or done=committed
        # (its waves carry rows only for never-committed — empty —
        # partitions, and the dynamic path writes nothing for them).
        single_fresh = not done and len(waves) == 1

        for wave_parts in waves:
            # prune to this wave's partitions; on a file source the
            # part_id filter does not push down (it's computed), but the
            # scan is shared work the wave structure deliberately trades
            # for durable checkpoints — waves=1 scans once.
            if len(wave_parts) < cfg.n_parts:
                wave_df = df.filter(F.col("part_id").isin(wave_parts))
            else:
                wave_df = df

            annotated = self.validator.annotate(wave_df)
            if cfg.persist:
                annotated.persist()
            try:
                keys = list(cfg.key_cols)

                # rule violations (first evaluation of the projection).
                # Repartition on part_id before the partitioned write:
                # without it every scan task opens a writer per part dir
                # (tasks × n_parts small files — measured 7× the CPU at 32
                # cores); with it each output partition is written by ~1
                # task.  Violations are a small fraction of input rows, so
                # this shuffle is cheap; add a second key if one partition's
                # violations ever outgrow a task.
                viol = annotated.select(
                    *keys, "part_id", F.explode("violations").alias("v")
                ).select(*keys, "part_id", "v.*")

                def _write_violations():
                    if single_fresh:
                        # no repartition either: the flat write streams
                        # straight from the scan tasks (the exchange
                        # existed to align tasks with part dirs)
                        viol.write.mode("overwrite").parquet(
                            self._path("violations"))
                        return
                    (viol.repartition("part_id")
                         .write.mode("overwrite")
                         .option("partitionOverwriteMode", "dynamic")
                         .partitionBy("part_id")
                         .parquet(self._path("violations")))

                # per-partition summary (second and last evaluation —
                # failed ROWS can't be recovered from the violations table
                # alone because (conv_id, turn_idx) keys are not unique;
                # that's what the uniqueness check finds)
                summary = annotated.groupBy("part_id").agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum((~F.col("passed")).cast("long")).alias("n_failed"),
                    F.sum(F.size("violations").cast("long")).alias("n_violations"),
                ).withColumn("lineage", F.lit(lineage))

                def _write_summary():
                    if single_fresh:
                        summary.write.mode("overwrite").parquet(
                            self._path("summary"))
                        return
                    (summary.write.mode("overwrite")
                            .option("partitionOverwriteMode", "dynamic")
                            .partitionBy("part_id")
                            .parquet(self._path("summary")))

                # the two writes are independent evaluations of the same
                # projection — overlap them; the checkpoint commit below
                # waits for BOTH (committed state must describe durable
                # violations AND summary)
                from concurrent.futures import ThreadPoolExecutor as _TPE
                with _TPE(max_workers=2) as wpool:
                    fv = wpool.submit(_write_violations)
                    fs = wpool.submit(_write_summary)
                    fv.result()
                    fs.result()

                if cfg.write_annotated:
                    (annotated.repartition("part_id")
                              .write.mode("overwrite")
                              .option("partitionOverwriteMode", "dynamic")
                              .partitionBy("part_id")
                              .parquet(self._path("annotated")))

                # checkpoint commit for THIS wave, from the durable files —
                # committed state always describes data that is on disk.
                # A wave with zero rows writes no readable part files;
                # nothing to commit (the empty partitions cost nothing to
                # revisit).
                # Local out_dirs take the driver-side path: the summary
                # is ≤ n_parts one-row files, so the Spark read costs a
                # partition-discovery job + a scan job and the commit a
                # write job — ~0.7 s of scheduling around a few KB
                # (guide §5: no cluster jobs for driver-sized data).
                # Any non-local scheme falls back to the Spark plan.
                committed_rows = read_local_rows(
                    spark, self._path("summary"),
                    columns=["part_id", "lineage", "n_rows", "n_failed",
                             "n_violations"])
                done_driver_side = False
                if committed_rows is not None:
                    wset = set(wave_parts)
                    has_lineage = bool(committed_rows) \
                        and "lineage" in committed_rows[0]
                    rows = [r for r in committed_rows
                            if r["part_id"] in wset
                            and (not has_lineage
                                 or r["lineage"] == lineage)]
                    done_driver_side = (not rows) or store.commit_rows(
                        rows, snap, shash, predicate_set)
                if not done_driver_side:
                    committed = None
                    try:
                        committed = (
                            spark.read.parquet(self._path("summary"))
                            .filter(F.col("part_id").isin(wave_parts))
                        )
                        if "lineage" in committed.columns:
                            committed = committed.filter(
                                F.col("lineage") == lineage)
                    except Exception:
                        pass
                    if committed is not None:
                        store.commit(committed, snap, shash, predicate_set)
            finally:
                if cfg.persist:
                    annotated.unpersist()

    def _run_dataset_checks(self, spark, df, conversations) -> dict[int, int]:
        cfg = self.config
        keys = list(cfg.key_cols)
        uniq = D.uniqueness_violations(df, keys)
        orphans = (
            D.referential_violations(df, conversations, cfg.conv_col, keys=keys)
            if conversations is not None
            else None
        )
        ordering = D.ordering_violations(
            df, cfg.conv_col, cfg.order_col, cfg.ts_col, keys=keys
        )
        seq = None
        if cfg.sequence_rules:
            from .operators import sequence as S

            seq = S.sequence_violations(
                df, conv_col=cfg.conv_col, idx_col=cfg.order_col,
                ts_col=cfg.ts_col, keys=keys, **cfg.sequence_rules
            )
        ds_viol = uniq
        for extra in (orphans, ordering, seq):
            if extra is not None:
                ds_viol = ds_viol.unionByName(extra)
        # per-check counts ride along on the write job itself
        # (df.observe collects aggregates during the action) — no
        # re-read job, and never a re-execution of the
        # uniqueness/join/window DAGs just for the report
        from pyspark.sql import Observation

        obs = Observation("ds_checks")
        codes = {
            "unique": E.NOT_UNIQUE.code,
            "orphan": E.ORPHAN_REFERENCE.code,
            "ordering": E.ORDERING_VIOLATION.code,
            "sequence": E.SEQUENCE_VIOLATION.code,
        }
        ds_viol = ds_viol.observe(obs, *[
            F.sum((F.col("code") == c).cast("long")).alias(name)
            for name, c in codes.items()
        ])
        ds_viol.write.mode("overwrite").parquet(self._path("dataset_violations"))
        got = obs.get
        return {c: int(got[name] or 0) for name, c in codes.items()}

    def _run_drift(self, spark, df) -> tuple:
        """Returns (drift_metrics, wrote_baseline).  The bool lets
        ``execute`` roll the first-run baseline write back when the
        validation waves fail — a committed baseline from a failed run
        would poison every later run's drift comparison."""
        cfg = self.config
        # one scan computes all three profiles (role/tool frequency +
        # text-length histogram) — at 100 TB each avoided pass matters
        profiles = D.multi_profile(df, [
            ("role", "role"),
            ("tool", "tool"),
            ("text_len", D.length_bucket("text")),
        ])
        baseline_path = self._path("baseline_stats")
        if fs_exists(spark, baseline_path):
            baseline = spark.read.parquet(baseline_path)
            return D.drift_metrics(profiles, baseline), False
        profiles.write.mode("overwrite").parquet(baseline_path)
        return [], True


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
