"""Streaming corpus ingest (streaming/validate_stream.py:
corpus_ingest_foreach_batch): the full acceptance gate per micro-batch
with the kept corpus as its own cross-batch dedup reference."""

import time

from pyspark.sql import functions as F

from cerberus_spark.streaming.validate_stream import (
    corpus_ingest_foreach_batch,
)

_SCHEMA = {
    "doc_id": {"type": "string", "required": True},
    "lang": {"type": "string", "allowed": ["en"]},
    "text": {"type": "string"},
}

_BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon")
_EVAL = "the held out benchmark sentence nobody may train on"

_FILE1 = [
    ("docA", "en", _BASE),
    # near-dup of docA in the SAME batch -> within-batch dedup keeps
    # the min id (docA)
    ("docB", "en", _BASE + " extra tail"),
    # 2 tokens -> under the quality floor
    ("docC", "en", "too short"),
    # embeds the eval sentence -> decontamination gate
    ("docD", "en", "padding words then " + _EVAL + " and more padding"),
]
_FILE2 = [
    # near-dup of the ALREADY-KEPT docA -> cross-batch dedup_against
    ("docE", "en", _BASE + " other tail"),
    # clean and unique -> kept
    ("docF", "en", "a genuinely fresh document with plenty of new "
                   "content words to shingle properly"),
    # rule violation (lang outside allowed)
    ("docG", "xx", "language gate should remove this row entirely"),
]


def test_corpus_ingest_two_batches(spark, tmp_path):
    from cerberus_spark import SparkValidator

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ddl = "doc_id string, lang string, text string"
    spark.createDataFrame(_FILE1, ddl).coalesce(1) \
        .write.mode("append").parquet(src)
    time.sleep(1.2)  # distinct mod-times -> deterministic batch order
    spark.createDataFrame(_FILE2, ddl).coalesce(1) \
        .write.mode("append").parquet(src)

    bench = spark.createDataFrame([(_EVAL,)], "text string")
    v = SparkValidator(_SCHEMA, key_cols=("doc_id",))
    cb = corpus_ingest_foreach_batch(
        out, bench=bench, id_col="doc_id", text_col="text",
        validator=v, quality_bounds={"tokens": (3, None)},
        contamination_n=5, dedup_threshold=0.6)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = stream.writeStream.foreachBatch(cb).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept = spark.read.parquet(f"{out}/corpus")
    ids = {r.doc_id for r in kept.collect()}
    # exactly one of the near-dup family {A, B, E} survives; C (quality),
    # D (contaminated), G (rule) never land; F always lands
    assert len(ids & {"docA", "docB", "docE"}) == 1
    assert ids & {"docC", "docD", "docG"} == set()
    assert "docF" in ids
    # epochs are the partition column of the corpus itself
    assert {r.epoch for r in kept.select("epoch").distinct().collect()} \
        == {0, 1}


def test_corpus_ingest_epoch_retry_is_idempotent(spark, tmp_path):
    """Re-running an epoch callback overwrites its own partition and
    does not dedup against its own half-committed write."""
    out = str(tmp_path / "out")
    cb = corpus_ingest_foreach_batch(
        out, id_col="doc_id", text_col="text", dedup_threshold=0.6)
    ddl = "doc_id string, text string"
    b0 = spark.createDataFrame([("a", _BASE)], ddl)
    cb(b0, 0)
    # retry epoch 0: the doc must survive (not self-deduped), once
    cb(b0, 0)
    kept = spark.read.parquet(f"{out}/corpus")
    assert [r.doc_id for r in kept.collect()] == ["a"]
    # a later epoch WITH a near-dup of epoch 0's doc drops it
    b1 = spark.createDataFrame([("z", _BASE + " tail")], ddl)
    cb(b1, 1)
    assert {r.doc_id for r in
            spark.read.parquet(f"{out}/corpus").collect()} == {"a"}


def test_corpus_ingest_funnel_stats(spark, tmp_path):
    from cerberus_spark import SparkValidator

    out = str(tmp_path / "out")
    bench = spark.createDataFrame([(_EVAL,)], "text string")
    v = SparkValidator(_SCHEMA, key_cols=("doc_id",))
    cb = corpus_ingest_foreach_batch(
        out, bench=bench, id_col="doc_id", text_col="text",
        validator=v, quality_bounds={"tokens": (3, None)},
        contamination_n=5, dedup_threshold=0.6)
    ddl = "doc_id string, lang string, text string"
    cb(spark.createDataFrame(_FILE1, ddl), 0)
    cb(spark.createDataFrame(_FILE2, ddl), 1)

    stats = {r.epoch: r.asDict() for r in
             spark.read.parquet(f"{out}/ingest_stats").collect()}
    # epoch 0: 4 in, all valid, docD contaminated, docC quality,
    # docB within-batch dup -> 1 kept
    assert stats[0]["n_in"] == 4 and stats[0]["n_valid"] == 4
    assert stats[0]["n_clean"] == 3 and stats[0]["n_quality"] == 2
    assert stats[0]["n_unique"] == 1 and stats[0]["n_kept"] == 1
    # epoch 1: 3 in, docG invalid, docE cross-batch dup -> 1 kept
    assert stats[1]["n_in"] == 3 and stats[1]["n_valid"] == 2
    assert stats[1]["n_unique"] == 2 and stats[1]["n_kept"] == 1


def test_corpus_ingest_stats_cost_is_one_aggregation(spark, tmp_path):
    """record_stats must not multiply per-epoch actions (r5 VERDICT
    item 6): the funnel is ONE aggregation over the staged frame, so
    an epoch with stats on runs at most 2 more Spark jobs than the
    same epoch with stats off (the old design ran persist+count per
    gate — 6 extra jobs)."""
    from cerberus_spark import SparkValidator

    bench = spark.createDataFrame([(_EVAL,)], "text string")
    ddl = "doc_id string, lang string, text string"
    batch = spark.createDataFrame(_FILE1, ddl)
    tracker = spark.sparkContext.statusTracker()

    def run(stats, out):
        v = SparkValidator(_SCHEMA, key_cols=("doc_id",))
        cb = corpus_ingest_foreach_batch(
            out, bench=bench, id_col="doc_id", text_col="text",
            validator=v, quality_bounds={"tokens": (3, None)},
            contamination_n=5, dedup_threshold=0.6, record_stats=stats)
        # high-water-mark delta, NOT len(): the status tracker retains
        # only the last N jobs, so len() saturates (and the delta goes
        # negative) once a long test session wraps the buffer — job
        # ids themselves are monotonic
        before = max(tracker.getJobIdsForGroup(None), default=0)
        cb(batch, 0)
        return max(tracker.getJobIdsForGroup(None), default=0) - before

    base = run(False, str(tmp_path / "off"))
    with_stats = run(True, str(tmp_path / "on"))
    assert with_stats - base <= 2, (base, with_stats)


def test_corpus_ingest_forwards_dedup_kw_to_cross_pass(spark, tmp_path):
    """dedup_kw must be accepted by BOTH the within-batch and the
    cross-corpus dedup (epoch >= 1 regression: persist_shingles used
    to explode in cross_dup_pairs only after epoch 0 had committed)."""
    out = str(tmp_path / "out")
    cb = corpus_ingest_foreach_batch(
        out, id_col="doc_id", text_col="text", dedup_threshold=0.6,
        dedup_kw={"persist_shingles": False, "num_perm": 16, "bands": 8},
        record_stats=False)
    ddl = "doc_id string, text string"
    cb(spark.createDataFrame([("a", _BASE)], ddl), 0)
    cb(spark.createDataFrame([("z", _BASE + " tail")], ddl), 1)
    assert {r.doc_id for r in
            spark.read.parquet(f"{out}/corpus").collect()} == {"a"}


def test_corpus_ingest_compact_every(spark, tmp_path):
    """compact_every=2: a 5-epoch ingest with in-line compaction keeps
    the identical corpus to the uncompacted run, epoch partitions
    below each watermark are merged, and a dup of an early-epoch doc
    is still caught AFTER its epoch got compacted away."""
    import os

    ddl = "doc_id string, text string"
    docs = {
        0: [("a", _BASE)],
        1: [("b", "a genuinely fresh document with plenty of new "
                  "content words to shingle properly")],
        2: [("c", "another entirely distinct body of text with its own "
                  "vocabulary and no overlap anywhere")],
        3: [("z", _BASE + " tail")],  # near-dup of epoch-0's doc a
        4: [("d", "final clean unique document closing out the stream "
                  "with fresh words")],
    }

    def run(out, **kw):
        cb = corpus_ingest_foreach_batch(
            out, id_col="doc_id", text_col="text", dedup_threshold=0.6,
            record_stats=False, **kw)
        for e, rows in docs.items():
            cb(spark.createDataFrame(rows, ddl), e)
        return {(r.doc_id, r.epoch) for r in
                spark.read.parquet(f"{out}/corpus").collect()}

    plain = run(str(tmp_path / "plain"))
    compacted = run(str(tmp_path / "comp"), compact_every=2)
    assert compacted == plain
    assert {r[0] for r in plain} == {"a", "b", "c", "d"}  # z deduped
    # epoch 4 ran the last compaction at watermark 4: bands 0-3 merged
    # into epoch=3, epoch 4's own commit appended after
    bands = sorted(os.listdir(f"{tmp_path}/comp/band_store/bands"))
    assert bands == ["epoch=3", "epoch=4"]
    assert sorted(os.listdir(f"{tmp_path}/plain/band_store/bands")) == [
        f"epoch={e}" for e in range(5)]


# ---------------------------------------------------------------------------
# vector ingest (the semantic mirror)
# ---------------------------------------------------------------------------


def _unit(seed, dim=16):
    import random as _r

    rng = _r.Random(seed)
    return [rng.gauss(0, 1) for _ in range(dim)]


def test_vector_ingest_multi_epoch(spark, tmp_path):
    """Vector twin of the corpus ingest: within-batch near-dups drop
    (min id kept), cross-batch dups drop against the bucket store +
    kept-vector corpus, NULL embeddings pass through but never pair,
    retries are idempotent, compaction preserves behavior."""
    import os

    from cerberus_spark.streaming.validate_stream import (
        vector_ingest_foreach_batch,
    )

    dim = 16
    base = {i: _unit(100 + i, dim) for i in range(4)}

    def near(v, eps, s):
        import random as _r

        rng = _r.Random(s)
        return [x + rng.gauss(0, eps) for x in v]

    ddl = "vec_id long, embedding array<double>"
    epochs = {
        0: [(1, base[0]), (2, near(base[0], 1e-3, 7)),   # within-batch dup
            (3, base[1]), (4, None)],                    # NULL kept
        1: [(10, near(base[0], 1e-3, 8)),                # dup of kept 1
            (11, base[2])],
        2: [(20, near(base[2], 1e-3, 9)),                # dup of kept 11
            (21, base[3]), (22, None)],                  # NULL kept
    }

    out = str(tmp_path / "out")
    cb = vector_ingest_foreach_batch(
        out, id_col="vec_id", emb_col="embedding", threshold=0.99,
        n_bits=8, n_tables=8, dim=dim, compact_every=2)
    for e, rows in epochs.items():
        cb(spark.createDataFrame(rows, ddl), e)
    # retry the last epoch: idempotent (no self-dedup, same rows)
    cb(spark.createDataFrame(epochs[2], ddl), 2)

    kept = {r.vec_id for r in
            spark.read.parquet(f"{out}/vectors").collect()}
    assert kept == {1, 3, 4, 11, 21, 22}
    # compaction ran at epoch 2 with watermark 2: epochs 0-1 merged
    assert sorted(os.listdir(f"{out}/emb_store/buckets")) \
        == ["epoch=1", "epoch=2"]
    stats = {r.epoch: (r.n_in, r.n_unique, r.n_kept) for r in
             spark.read.parquet(f"{out}/ingest_stats").collect()}
    assert stats[0] == (4, 3, 3)
    assert stats[1] == (2, 2, 1)
    assert stats[2] == (3, 3, 2)


def test_corpus_ingest_lm_surprisal_gate(spark, tmp_path):
    """The stored-ngram-model LM gate: a document whose token stream
    is gibberish under the model drops at the 'lm' stage; in-model
    text passes; tokenless rows pass (no evidence => no drop)."""
    from cerberus_spark.functions.surprisal import (
        ngram_surprisal_report_stored, write_ngram_model,
    )

    # train a model on natural-ish repeated text
    train_rows = [(f"t{i}", " ".join(_BASE.split()[: 3 + i % 15]))
                  for i in range(40)]
    train = spark.createDataFrame(train_rows, "doc_id string, text string")
    model = str(tmp_path / "ngm")
    write_ngram_model(train, model, "doc_id", "text", order=3)

    rows = [
        ("in1", "en", "alpha beta gamma delta epsilon zeta"),  # in-model
        ("odd1", "en", "zzq qqz xyzzy frobnitz quux zork grue plugh"),
        ("empty1", "en", "   "),                               # tokenless
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string, "
                                     "text string")
    # pick a threshold between the two observed scores
    sc = {r.doc_id: r.surprisal for r in ngram_surprisal_report_stored(
        df, model, "doc_id", "text").collect()}
    assert sc["odd1"] > sc["in1"]
    thr = (sc["odd1"] + sc["in1"]) / 2

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    df.coalesce(1).write.mode("append").parquet(src)
    cb = corpus_ingest_foreach_batch(
        out, id_col="doc_id", text_col="text", dedup_threshold=None,
        surprisal_model=model, surprisal_max=float(thr))
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = stream.writeStream.foreachBatch(cb).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept = {r.doc_id for r in
            spark.read.parquet(f"{out}/corpus").collect()}
    assert kept == {"in1", "empty1"}
    stats = spark.read.parquet(f"{out}/ingest_stats").first()
    assert stats["n_in"] == 3 and stats["n_lm"] == 2 \
        and stats["n_kept"] == 2
