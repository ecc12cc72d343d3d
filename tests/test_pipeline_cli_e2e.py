"""`pipeline` CLI (round-11 verdict #4): the composed ingest chain —
text gate -> decontam -> streamed diversity — as ONE subprocess
invocation per micro-batch, with the same stage-by-stage parity
assertion `tests/test_ingest_pipeline.py` pins for the hand-wired
chain: every stage's streamed artifact equals the batch-side law over
the union, and replaying a batch (explicit --batch-id) is a no-op at
every stage."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

_EVAL_TEXT = "the quick brown fox jumps over the lazy dog tonight"


def _contam(i: int) -> bool:
    return i % 11 == 3


def _doc_text(i: int) -> str:
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


def _run(args, **kw):
    r = subprocess.run(
        [sys.executable, "-m", "sqlserver_pg_cdc_spark.cli", "pipeline"]
        + args,
        cwd="/root/repo", capture_output=True, text=True, timeout=600,
        **kw,
    )
    return r


def test_pipeline_cli_chain_parity_and_replay(tmp_path, spark):
    from sqlserver_pg_cdc_spark.streaming.decontam import EvalGramIndexSink

    # the eval index the decontam stage probes, built once up front
    eval_state = str(tmp_path / "eval_state")
    EvalGramIndexSink(spark, eval_state, "doc_id", "text", k=8,
                      n_partitions=4)(
        spark.createDataFrame([(1, _EVAL_TEXT)], "doc_id long, text string"),
        0,
    )
    b0, b1 = list(range(0, 40)), list(range(40, 100))
    _docs(spark, b0).write.parquet(str(tmp_path / "b0"))
    _docs(spark, b1).write.parquet(str(tmp_path / "b1"))
    root = str(tmp_path / "chain")
    base = [
        "--state-root", root,
        "--stages", "text-dedup,decontam,diversity",
        "--eval-state", eval_state, "--gram-k", "8",
        "--threshold", "0.5", "--num-hashes", "32", "--bands", "16",
        "--quota", "2", "--cells", "4", "--partitions", "4",
    ]
    outs = []
    for i, b in enumerate(("b0", "b1")):
        r = _run(base + ["--input", str(tmp_path / b),
                         "--output", str(tmp_path / f"final{i}")])
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["batch_id"] == i  # marker-sequenced
        assert set(out["stage_wall_s"]) == {
            "text-dedup", "decontam", "diversity"
        }
        # survivors shrink monotonically through the chain
        s = out["survivors"]
        assert s["text-dedup"] >= s["decontam"] >= 0
        outs.append(out)

    # --- batch-side laws over the union (the ingest-pipeline test's
    # --- assertion, now against the CLI-driven state) ----------------
    all_ids = b0 + b1
    classes: dict = {}
    for i in all_ids:
        classes.setdefault(i % 8, []).append(i)
    survivors_ids = set()
    for members in classes.values():
        in_b0 = [m for m in members if m in b0]
        survivors_ids.add(min(in_b0) if in_b0 else min(members))
    clean_ids = {i for i in survivors_ids if not _contam(i)}

    dup_docs = {
        r["doc"]
        for r in spark.read.parquet(
            os.path.join(root, "text_dedup", "dups", "batch_*")
        ).collect()
    }
    assert dup_docs == set(all_ids) - survivors_ids
    quarantined = {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(root, "decontam", "quarantine", "batch_*")
        ).collect()
    }
    assert quarantined == survivors_ids - clean_ids
    # final survivors artifact of batch 1 = clean survivors first seen
    # in batch 1
    final1 = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "final1")).collect()
    }
    assert final1 == {i for i in clean_ids if i in b1}
    # diversity selection equals the batch sampler over the clean
    # survivors with the sink's persisted epoch
    from sqlserver_pg_cdc_spark.functions.vectors import norm
    from sqlserver_pg_cdc_spark.operators.sampling import diversity_sample

    div_state = os.path.join(root, "diversity", "state")
    cents = spark.read.parquet(
        os.path.join(div_state, "__centroids")
    ).select("cell_id", "cv", norm("cv").alias("cn"))
    want = {
        (r["doc_id"], r["cell_id"])
        for r in diversity_sample(
            _docs(spark, sorted(clean_ids)).select("doc_id", "embedding"),
            "doc_id", "embedding", 2, n_cells=4, centroids=cents,
        ).collect()
    }
    sel = spark.read.parquet(os.path.join(div_state, "part_*"))
    sel = sel.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    got = {(r["doc"], r["cell_id"]) for r in sel.collect()}
    assert got == want

    # --- REPLAY batch 1 with an explicit --batch-id: every stage is a
    # --- no-op --------------------------------------------------------
    r = _run(base + ["--input", str(tmp_path / "b1"), "--batch-id", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    sel2 = spark.read.parquet(os.path.join(div_state, "part_*"))
    sel2 = sel2.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    assert {(r2["doc"], r2["cell_id"]) for r2 in sel2.collect()} == want
    dup_docs2 = {
        r2["doc"]
        for r2 in spark.read.parquet(
            os.path.join(root, "text_dedup", "dups", "batch_*")
        ).collect()
    }
    assert dup_docs2 == dup_docs
    # the marker did not advance on an explicit-id replay
    with open(os.path.join(root, "__pipeline_next_batch.json")) as f:
        assert json.load(f)["next_batch_id"] == 2


def test_pipeline_cli_stage_validation(tmp_path):
    bad = [
        ["--stages", "text-dedup,nope"],
        ["--stages", "text-dedup,text-dedup"],
        ["--stages", ""],
        ["--stages", "decontam"],  # no --eval-state
    ]
    for extra in bad:
        r = _run([
            "--input", str(tmp_path / "missing"),
            "--state-root", str(tmp_path / "root"),
        ] + extra)
        assert r.returncode != 0
        assert "--stages" in r.stderr or "--eval-state" in r.stderr


def test_pipeline_cli_media_then_diversity(tmp_path, spark):
    """`pipeline --stages media-dedup,diversity`: a mixed crawl batch
    (image + audio payloads, embeddings riding the same rows) gates
    per family under media='auto' and the survivors fold into the
    diversity selection — the media chain as one subprocess per
    micro-batch."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        encode_wav_pcm16,
    )

    def img(cls, codec="bmp"):
        y, x = np.mgrid[0:64, 0:64]
        g = (37 * ((x * (cls + 2)) // 16) + 59 * ((y * (cls + 3)) // 16)
             + 29 * (((x + y) * (cls + 1)) // 32) + cls * 41) % 256
        px = np.stack([g.astype(np.uint8)] * 3, axis=2)
        enc = encode_png if codec == "png" else encode_bmp
        return enc(64, 64, px.tobytes())

    def wav(cls):
        t = np.arange(4000)
        x = np.clip(
            6000 * np.sign(np.sin(2 * np.pi * t * (cls + 2) / 128))
            + 4000 * np.sign(np.sin(2 * np.pi * t * (2 * cls + 5) / 512)),
            -32767, 32767,
        ).astype(np.int16)
        return encode_wav_pcm16(8000, x)

    def vec(i):
        return [1.0 if d == i % 4 else 0.05 * ((i + d) % 3)
                for d in range(4)]

    schema = "doc_id long, payload binary, embedding array<double>"
    b0 = [(1, img(0), vec(1)), (2, img(0), vec(2)), (3, wav(0), vec(3))]
    b1 = [(4, img(0, "png"), vec(4)), (5, wav(3), vec(5))]
    spark.createDataFrame(b0, schema).write.parquet(str(tmp_path / "m0"))
    spark.createDataFrame(b1, schema).write.parquet(str(tmp_path / "m1"))
    root = str(tmp_path / "chain")
    base = [
        "--state-root", root, "--stages", "media-dedup,diversity",
        "--media", "auto", "--quota", "4", "--cells", "2",
        "--partitions", "4",
    ]
    for i, b in enumerate(("m0", "m1")):
        r = _run(base + ["--input", str(tmp_path / b),
                         "--output", str(tmp_path / f"out{i}")])
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert set(out["stage_wall_s"]) == {"media-dedup", "diversity"}
    # batch 0: doc 2 (same image) rejected within-batch; batch 1:
    # doc 4 (PNG re-encode of the indexed BMP) rejected cross-corpus
    dup = {
        r["doc"]: r["kind"]
        for r in spark.read.parquet(
            os.path.join(root, "media_dedup", "dups", "batch_*")
        ).collect()
    }
    assert dup == {2: "batch", 4: "corpus"}
    out1 = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out1")).collect()
    }
    assert out1 == {5}
    sel = spark.read.parquet(
        os.path.join(root, "diversity", "state", "part_*")
    )
    sel = sel.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    assert {r["doc"] for r in sel.collect()} == {1, 3, 5}
    # replay batch 1: no-op at both stages
    r = _run(base + ["--input", str(tmp_path / "m1"), "--batch-id", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    sel2 = spark.read.parquet(
        os.path.join(root, "diversity", "state", "part_*")
    )
    sel2 = sel2.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    assert {r2["doc"] for r2 in sel2.collect()} == {1, 3, 5}


def test_pipeline_cli_retain_batches(tmp_path, spark):
    """`pipeline --retain-batches N`: one retention pass over every
    configured stage — gate dup log and decontam generations keep the
    newest N batches replayable, the diversity state purges eviction
    tombstones past the horizon — without changing any stage's live
    artifacts' CONTENT."""
    from sqlserver_pg_cdc_spark.streaming.decontam import EvalGramIndexSink

    eval_state = str(tmp_path / "eval_state")
    EvalGramIndexSink(spark, eval_state, "doc_id", "text", k=8,
                      n_partitions=4)(
        spark.createDataFrame([(1, _EVAL_TEXT)], "doc_id long, text string"),
        0,
    )
    root = str(tmp_path / "chain")
    base = [
        "--state-root", root,
        "--stages", "text-dedup,decontam,diversity",
        "--eval-state", eval_state,
        "--threshold", "0.5", "--num-hashes", "32", "--bands", "16",
        "--quota", "2", "--cells", "4", "--partitions", "4",
    ]
    batches = [list(range(0, 30)), list(range(30, 60)),
               list(range(60, 100))]
    for i, ids in enumerate(batches):
        _docs(spark, ids).write.parquet(str(tmp_path / f"b{i}"))
        r = _run(base + ["--input", str(tmp_path / f"b{i}")])
        assert r.returncode == 0, r.stderr[-2000:]
    dup_before = {
        (r["doc"], r["dup_of"])
        for r in spark.read.parquet(
            os.path.join(root, "text_dedup", "dups", "batch_*")
        ).collect()
    }
    r = _run(base + ["--retain-batches", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(out["retention"]) == {
        "text-dedup", "decontam", "diversity"
    }
    # gate log: only the newest generation stays as a batch dir; the
    # compacted generation carries the older content verbatim
    gens = sorted(
        d for d in os.listdir(os.path.join(root, "text_dedup", "dups"))
        if d.startswith("batch_")
    )
    assert gens == ["batch_2"]
    from sqlserver_pg_cdc_spark.streaming.batchlog import read_batch_log

    dup_after = {
        (r2["doc"], r2["dup_of"])
        for r2 in read_batch_log(
            spark, os.path.join(root, "text_dedup", "dups")
        ).collect()
    }
    assert dup_after == dup_before
    # decontam generations compacted the same way
    acc_gens = sorted(
        d for d in os.listdir(os.path.join(root, "decontam", "accepted"))
        if d.startswith("batch_")
    )
    assert acc_gens == ["batch_2"]
    # diversity tombstones at or below the horizon are gone; the live
    # selection is untouched
    sel = spark.read.parquet(
        os.path.join(root, "diversity", "state", "part_*")
    )
    dead = sel.filter(F.coalesce(F.col("__del"), F.lit(False)))
    assert dead.filter(F.col("lsn") <= 1).count() == 0


def test_pipeline_cli_media_frame_granularity(tmp_path, spark):
    """`pipeline --stages media-dedup --media video
    --media-granularity frame`: the re-cut recall path inside the
    chain — a trimmed/reordered clip rejects against the indexed
    original across invocations."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mcv,
    )
    from sqlserver_pg_cdc_spark.workload import _RECUT_FRAMES, _recut_scene

    orig = encode_mcv(
        [_recut_scene(0, f) for f in range(8)], fps=10, gop=4, qscale=4
    )
    recut = encode_avi_mjpeg(
        [encode_jpeg(48, 32, _recut_scene(0, f).tobytes())
         for f in _RECUT_FRAMES],
        48, 32, fps=10,
    )
    schema = "doc_id long, payload binary"
    spark.createDataFrame([(1, orig)], schema).write.parquet(
        str(tmp_path / "v0")
    )
    spark.createDataFrame([(2, recut)], schema).write.parquet(
        str(tmp_path / "v1")
    )
    root = str(tmp_path / "chain")
    base = [
        "--state-root", root, "--stages", "media-dedup",
        "--media", "video", "--media-granularity", "frame",
        "--media-min-frames", "3", "--partitions", "4",
    ]
    for b in ("v0", "v1"):
        r = _run(base + ["--input", str(tmp_path / b)])
        assert r.returncode == 0, r.stderr[-2000:]
    dup = {
        r["doc"]: (r["dup_of"], r["hamming"], r["kind"])
        for r in spark.read.parquet(
            os.path.join(root, "media_dedup", "dups", "batch_*")
        ).collect()
    }
    assert dup == {2: (1, 0, "corpus")}
