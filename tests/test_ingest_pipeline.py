"""The composed ingest path — the production story the gates exist
for, exercised END TO END as one foreachBatch chain per micro-batch:

    text near-dup GATE  ->  eval-set DECONTAM gate  ->  streamed
    DIVERSITY sampler

Each stage's streamed state lives under its own dir; the chain hands
each batch's survivors to the next stage through the stages' own
exactly-once artifacts (the dup-log generation, the accepted
generation). The end assertion recomputes the whole pipeline
BATCH-SIDE over the union of everything ingested and demands equality
— the same streamed==batch discipline each stage pins individually,
composed."""

from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.sampling import diversity_sample
from sqlserver_pg_cdc_spark.streaming.decontam import (
    DecontamGate,
    EvalGramIndexSink,
)
from sqlserver_pg_cdc_spark.streaming.diversity import DiversitySampleSink
from sqlserver_pg_cdc_spark.streaming.minhash import DedupGateSink

_EVAL_TEXT = "the quick brown fox jumps over the lazy dog tonight"


def _contam(i: int) -> bool:
    return i % 11 == 3


def _doc_text(i: int) -> str:
    """8 near-dup classes with DISJOINT per-class vocabularies (the
    same 60-word base per class, one trailing marker word per doc) —
    every same-class pair, contaminated or not, shares >= 0.83 shingle
    Jaccard (well above the 0.5 gate threshold) while cross-class
    pairs share at most the eval sentence (~0.07); docs with
    i % 11 == 3 append the eval sentence (contaminated). The gate runs
    32 hashes / 16 bands (2-row bands): at J >= 0.83 the per-pair
    banding miss probability is ~1e-8, so the class law is effectively
    exact and fully deterministic (MinHash is md5-driven — a green run
    is green forever)."""
    c = i % 8
    base = " ".join(f"w{c}x{j}" for j in range(60))
    text = f"{base} marker{i}"
    if _contam(i):
        text = f"{text} {_EVAL_TEXT}"
    return text


def _vec(i: int) -> list:
    c = i % 8
    base = [1.0 if d == c % 6 else 0.1 * ((c + d) % 3) for d in range(6)]
    return [b + 0.01 * ((i * (d + 3)) % 7) for d, b in enumerate(base)]


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, _doc_text(i), _vec(i)) for i in ids],
        "doc_id long, text string, embedding array<double>",
    )


def test_gate_chain_streamed_equals_batch_recompute(spark, tmp_path):
    quota = 2
    text_gate = DedupGateSink(
        spark, str(tmp_path / "dd_state"), str(tmp_path / "dd_dups"),
        "doc_id", "text", threshold=0.5, n_partitions=4,
        num_hashes=32, bands=16,
    )
    # the eval index shares the corpus id-column name: the gate probes
    # corpus batches through the index's own id_col
    eval_idx = EvalGramIndexSink(
        spark, str(tmp_path / "eval_state"), "doc_id", "text",
        k=8, n_partitions=4,
    )
    eval_idx(
        spark.createDataFrame([(1, _EVAL_TEXT)], "doc_id long, text string"),
        0,
    )
    decontam = DecontamGate(
        eval_idx, str(tmp_path / "acc"), str(tmp_path / "quar"),
        min_hits=1,
    )
    sampler = DiversitySampleSink(
        spark, str(tmp_path / "div_state"), "doc_id", "embedding",
        quota=quota, n_cells=4, n_partitions=4,
    )

    def pipeline(batch_df, batch_id):
        import os

        text_gate(batch_df, batch_id)
        rejected = spark.read.parquet(
            text_gate._dup_batch_dir(batch_id)
        ).select(F.col("doc").alias("doc_id"))
        survivors = batch_df.join(rejected, "doc_id", "left_anti")
        decontam(survivors, batch_id)
        accepted = spark.read.parquet(
            os.path.join(str(tmp_path / "acc"), f"batch_{int(batch_id)}")
        )
        sampler(accepted.select("doc_id", "embedding"), batch_id)

    b0 = list(range(0, 40))
    b1 = list(range(40, 100))
    pipeline(_docs(spark, b0), 0)
    pipeline(_docs(spark, b1), 1)

    # --- batch-side recompute over the union -------------------------
    all_ids = b0 + b1
    # stage 1, text dedup law: the canonical of each near-dup class is
    # the minimum id the STREAM saw first (batch 0's class min when the
    # class appeared there, else batch 1's). A contaminated canonical
    # is possible — the class whose minimum embeds the eval sentence
    # contributes NOTHING downstream (its canonical quarantines at
    # stage 2 and its other members were rejected at stage 1: the
    # composition order matters and the test pins it).
    classes = {}
    for i in all_ids:
        classes.setdefault(i % 8, []).append(i)
    survivors_ids = set()
    for members in classes.values():
        in_b0 = [m for m in members if m in b0]
        survivors_ids.add(min(in_b0) if in_b0 else min(members))
    # stage 2, decontamination law: drops eval-gram carriers
    clean_ids = {i for i in survivors_ids if not _contam(i)}
    # the streamed artifacts must match stage by stage
    dup_log_docs = {
        r["doc"] for r in text_gate.dup_log().collect()
    }
    assert dup_log_docs == set(all_ids) - survivors_ids
    qlog = decontam.quarantine_log()
    quarantined = (
        set() if qlog is None else {r["doc_id"] for r in qlog.collect()}
    )
    assert quarantined == survivors_ids - clean_ids
    # stage 3, diversity law: the standing selection equals the batch
    # sampler over the CLEAN SURVIVORS with the sink's pinned epoch
    from sqlserver_pg_cdc_spark.functions.vectors import norm

    cents = spark.read.parquet(sampler._centroids_path()).select(
        "cell_id", "cv", norm("cv").alias("cn")
    )
    want = {
        (r["doc_id"], r["cell_id"])
        for r in diversity_sample(
            _docs(spark, sorted(clean_ids)).select("doc_id", "embedding"),
            "doc_id", "embedding", quota, n_cells=4, centroids=cents,
        ).collect()
    }
    got = {(r["doc"], r["cell_id"]) for r in sampler.selection().collect()}
    assert got == want
    # replaying the whole last micro-batch through the CHAIN is a no-op
    # at every stage (each stage is exactly-once by construction)
    pipeline(_docs(spark, b1), 1)
    assert {
        (r["doc"], r["cell_id"]) for r in sampler.selection().collect()
    } == want
    assert {r["doc"] for r in text_gate.dup_log().collect()} == dup_log_docs


def test_chain_end_to_end_writestream(spark, tmp_path):
    """The product shape (round-11 verdict #4): `ChainedGateSink`
    driving the gate -> decontam -> streamed-diversity chain as ONE
    writeStream.foreachBatch over a real file-source stream — the
    same laws the hand-wired chain test pins, through Structured
    Streaming's own batch sequencing."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sqlserver_pg_cdc_spark.streaming.chain import (
        ChainedGateSink,
        DecontamStage,
        DiversityStage,
        GateStage,
    )

    spool = tmp_path / "spool"
    os.makedirs(spool)

    def write(fname, ids):
        pq.write_table(
            pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([_doc_text(i) for i in ids]),
                "embedding": pa.array(
                    [_vec(i) for i in ids],
                    pa.list_(pa.float64()),
                ),
            }),
            str(spool / fname),
        )

    b0, b1 = list(range(0, 40)), list(range(40, 100))
    write("a.parquet", b0)
    write("b.parquet", b1)
    now = _time.time()
    os.utime(spool / "a.parquet", (now - 60, now - 60))
    os.utime(spool / "b.parquet", (now, now))

    text_gate = DedupGateSink(
        spark, str(tmp_path / "dd_state"), str(tmp_path / "dd_dups"),
        "doc_id", "text", threshold=0.5, n_partitions=4,
        num_hashes=32, bands=16,
    )
    eval_idx = EvalGramIndexSink(
        spark, str(tmp_path / "eval_state"), "doc_id", "text",
        k=8, n_partitions=4,
    )
    eval_idx(
        spark.createDataFrame([(1, _EVAL_TEXT)], "doc_id long, text string"),
        0,
    )
    decontam = DecontamGate(
        eval_idx, str(tmp_path / "acc"), str(tmp_path / "quar"),
        min_hits=1,
    )
    sampler = DiversitySampleSink(
        spark, str(tmp_path / "div_state"), "doc_id", "embedding",
        quota=2, n_cells=4, n_partitions=4,
    )
    chain = ChainedGateSink(spark, [
        GateStage("text-dedup", text_gate, "doc_id"),
        DecontamStage("decontam", decontam),
        DiversityStage("diversity", sampler, "doc_id", "embedding"),
    ])
    q = (
        spark.readStream.schema(
            "doc_id long, text string, embedding array<double>"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(spool))
        .writeStream.foreachBatch(chain)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # the hand-wired chain test's batch-side laws, verbatim
    all_ids = b0 + b1
    classes = {}
    for i in all_ids:
        classes.setdefault(i % 8, []).append(i)
    survivors_ids = set()
    for members in classes.values():
        in_b0 = [m for m in members if m in b0]
        survivors_ids.add(min(in_b0) if in_b0 else min(members))
    clean_ids = {i for i in survivors_ids if not _contam(i)}
    assert {
        r["doc"] for r in text_gate.dup_log().collect()
    } == set(all_ids) - survivors_ids
    qlog = decontam.quarantine_log()
    assert {
        r["doc_id"] for r in qlog.collect()
    } == survivors_ids - clean_ids
    from sqlserver_pg_cdc_spark.functions.vectors import norm

    cents = spark.read.parquet(sampler._centroids_path()).select(
        "cell_id", "cv", norm("cv").alias("cn")
    )
    want = {
        (r["doc_id"], r["cell_id"])
        for r in diversity_sample(
            _docs(spark, sorted(clean_ids)).select("doc_id", "embedding"),
            "doc_id", "embedding", 2, n_cells=4, centroids=cents,
        ).collect()
    }
    assert {
        (r["doc"], r["cell_id"]) for r in sampler.selection().collect()
    } == want
    # per-stage walls were recorded for both batches
    from sqlserver_pg_cdc_spark.streaming import phases

    snap = phases.snapshot("ChainedGateSink")
    assert set(snap) >= {"text-dedup", "decontam", "diversity"}
