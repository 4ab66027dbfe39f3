"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship workload is the north-rule full validation pass (per-turn
rules + uniqueness + referential + ordering + drift + checkpoint write)
over the deterministic synthetic transcripts at the matching scale
(sf0.1 → 600k turns).  `value` is its wall-clock; the JSON also carries
`turns_per_sec`.  Run scripts/scaling_bench.py for the N-vs-4N
efficiency evidence (BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

_SF_ROWS = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000,
            "sf1": 6_000_000, "sf10": 60_000_000}


def sf_of(path: str) -> str:
    base = os.path.basename(path.rstrip("/"))
    return base if base.startswith("sf") else "sf0.1"


def main() -> None:
    sf = sf_of(SF_DIR)
    # the transcripts workload scale can be overridden independently of the
    # testdata dir (scripts/scaling_bench.py uses sf1 = 6M turns so the
    # full pass is compute-bound rather than fixed-overhead-bound)
    tsf = os.environ.get("SPARK_GRAFT_TRANSCRIPTS_SF", sf)
    n_rows = _SF_ROWS.get(tsf, 600_000)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("cerberus_spark_bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        # sf0.1 input is one ~100MB parquet file; split it finer so the
        # scan parallelizes across all cores instead of 1-2 tasks
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # keep AQE from coalescing bench-scale shuffles onto 2-3 cores
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from cerberus_spark.run import RunConfig, ValidationRun
    from cerberus_spark.sources.transcripts import TURN_SCHEMA, ensure_dataset, load

    repo = os.path.dirname(os.path.abspath(__file__))
    data_dir = os.path.join(repo, ".data", f"transcripts_{tsf}")
    ensure_dataset(data_dir, n_rows, seed=42)

    timings: dict[str, float] = {}

    # -- flagship: full validation pass (north-rule workload) --------------
    t_df, c_df = load(spark, data_dir)
    # warm-up pass on a slice (JIT/codegen/IO caches)
    warm_out = tempfile.mkdtemp(prefix="cerb_warm_")
    ValidationRun(TURN_SCHEMA, RunConfig(out_dir=warm_out, n_parts=8, resume=False)).execute(
        t_df.limit(20_000), c_df
    )
    shutil.rmtree(warm_out, ignore_errors=True)

    # best-of-N damps the sandbox's noisy-neighbor variance (the machine
    # shares cores; identical runs have measured 2-20x apart under
    # co-tenant bursts — see BENCH/BASELINE.md noise protocol)
    repeats = int(os.environ.get("SPARK_GRAFT_REPEAT", "5"))
    full_pass, report = None, None
    for _ in range(max(1, repeats)):
        out_dir = tempfile.mkdtemp(prefix="cerb_bench_")
        t0 = time.time()
        rep = ValidationRun(
            TURN_SCHEMA, RunConfig(out_dir=out_dir, n_parts=64, resume=False)
        ).execute(t_df, c_df)
        elapsed = time.time() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        if full_pass is None or elapsed < full_pass:
            full_pass, report = elapsed, rep
    timings["validate_full_pass"] = round(full_pass, 3)

    # compute-phase throughput: the parallelizable core (compiled
    # validation projection + aggregate) without sinks/orchestration —
    # isolates what actually scales with executors
    from pyspark.sql import functions as FF
    validator = ValidationRun(TURN_SCHEMA, RunConfig(out_dir="/tmp/_unused")).validator
    compute = None
    for _ in range(max(1, repeats)):
        t0 = time.time()
        validator.annotate(t_df).agg(
            FF.sum((~FF.col("passed")).cast("long"))
        ).collect()
        e = time.time() - t0
        compute = e if compute is None or e < compute else compute
    timings["validate_compute_phase"] = round(compute, 3)

    # conversation-sequence grammar over the same transcripts scale
    # (one window pass per conversation; operators/sequence.py)
    from cerberus_spark.operators import sequence as seqmod

    seq_best = None
    for _ in range(max(1, repeats)):
        t0 = time.time()
        seqmod.sequence_violations(
            t_df, first_roles=["system"],
            transitions={"system": ["user"],
                         "user": ["assistant", "tool", "system"],
                         "assistant": ["user", "system"],
                         "tool": ["user", "system"]},
            contiguous=True, monotone_ts=True,
            order_tie=("ts", "role", "text", "tool"),
        ).write.format("noop").mode("overwrite").save()
        e = time.time() - t0
        seq_best = e if seq_best is None or e < seq_best else seq_best
    timings["sequence_grammar_transcripts"] = round(seq_best, 3)

    # corpus-assembly heads over the same transcripts scale: the PII
    # scrub chain (stateless regex projection) and greedy token-budget
    # packing (one conv exchange + mapInPandas scan)
    from cerberus_spark.functions import pii as piimod
    from cerberus_spark.operators import pipeline as pipemod

    sig = piimod.pii_signals(FF.col("text"))
    assemble = {
        "redact_pii_transcripts": lambda: t_df.select(
            "conv_id", "turn_idx",
            *[c.alias(k) for k, c in sig.items()]),
        "pack_transcripts": lambda: pipemod.pack_sequences(
            t_df, "conv_id", "turn_idx", "text", budget=512,
            order_tie=("ts", "role", "text", "tool")),
    }
    for name, build in assemble.items():
        best = None
        for _ in range(max(1, repeats)):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            e = time.time() - t0
            best = e if best is None or e < best else best
        timings[name] = round(best, 3)

    # -- supporting headline queries over the driver testdata --------------
    heads = [] if os.environ.get("SPARK_GRAFT_ONLY_FULL") else [
        "validate_events_violations",
        "uniqueness_lineitem",
        "stats_profile_lineitem",
        "token_stats_documents",
        "topk_embeddings_cosine",
        "minhash_near_dups_documents",
        "asof_purchase_events",
        "sessionize_events",
        # round-5 text-analysis family (documents table)
        "contamination_documents",
        "repetition_documents",
        "surprisal_documents",
        "mixture_resample_documents",
        # round-6 additions
        "ngram_surprisal_documents",
        "cross_dedup_stored_documents",
        "bm25_documents",
        "dsir_documents",
        "semantic_dedup_embeddings",
    ]
    qs = entrymod.queries()
    # best-of-N per head query: a single co-tenant burst on this shared
    # box inflates one-shot walls 2-20x (see BENCH/BASELINE.md noise
    # protocol) — the minimum over a few reps is the standard estimator
    # best-of-3 default: r3's 4.7x "topk regression" was a single
    # co-tenant burst surviving best-of-2 (re-measured r4: 0.6-1.0s)
    head_reps = int(os.environ.get("SPARK_GRAFT_HEAD_REPEAT", "3"))
    for name in heads:
        best = None
        for _ in range(max(1, head_reps)):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            e = time.time() - t0
            best = e if best is None or e < best else best
        timings[name] = round(best, 3)

    # -- decomposed band-store head (r6 verdict item 4) -------------------
    # cross_dedup_stored_documents above mkdtemps a store, BUILDS the
    # reference into it, then probes — an end-to-end certification whose
    # composite wall reads as probe cost.  These two rows separate them:
    # build is the one-time epoch-commit cost (amortized across every
    # later probe in the ingest), probe is the steady-state per-epoch
    # cost the scale story rests on.
    if not os.environ.get("SPARK_GRAFT_ONLY_FULL"):
        from pyspark.sql import functions as F

        from cerberus_spark.functions import dedup as DD

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ref = docs.filter(F.col("doc_id") % 10 < 3)
        new = docs.filter(F.col("doc_id") % 10 >= 3)
        best_b = best_p = None
        for _ in range(max(1, head_reps)):
            store = tempfile.mkdtemp(prefix="bench_band_store_")
            try:
                t0 = time.time()
                DD.write_band_store(ref, store, epoch=0, id_col="doc_id",
                                    text_col="text")
                e = time.time() - t0
                best_b = e if best_b is None or e < best_b else best_b
                t0 = time.time()
                DD.cross_dup_pairs_stored(new, store, "doc_id", "text",
                                          threshold=0.6) \
                    .write.format("noop").mode("overwrite").save()
                e = time.time() - t0
                best_p = e if best_p is None or e < best_p else best_p
            finally:
                shutil.rmtree(store, ignore_errors=True)
        timings["cross_dedup_store_build"] = round(best_b, 3)
        timings["cross_dedup_store_probe"] = round(best_p, 3)

    result = {
        "metric": "validated_turns_per_sec_full_pass",
        "value": round(report.n_turns / full_pass, 1) if full_pass > 0 else 0,
        "unit": "turns/sec",
        "queries": timings,
        "sf": sf,
        "transcripts_sf": tsf,
        "detail": {
            "n_turns": report.n_turns,
            "n_failed": report.n_failed,
            "n_rule_violations": report.n_rule_violations,
            "n_unique_violations": report.n_unique_violations,
            "n_orphan_violations": report.n_orphan_violations,
            "n_ordering_violations": report.n_ordering_violations,
            "full_pass_sec": round(full_pass, 3),
            "cpus": int(CPUS),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
