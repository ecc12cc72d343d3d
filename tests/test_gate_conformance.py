"""Gate-template CONFORMANCE suite (round-11 verdict #6): the
invariants `streaming/gate.GatedIndexMixin` promises for EVERY family
— until now pinned only by each family's oracle row and scattered
per-family pytests — run here as ONE parametrized suite over all
registered gate families, so any future gate inherits its conformance
tests by adding a fixture entry:

* within-batch clusters keep their MINIMUM id; direct losers log
  their score, transitively-linked losers log NULL (chain families);
* cross-corpus dup_of is deterministic: best score, tie -> smallest
  indexed id;
* the dup log's id dtype is pinned to the stored key dtype, and a
  replayed batch overwrites its generation with identical content;
* CDC deletes bypass the gate but still reach (and retire from) the
  index;
* every persisted block is unpersisted even when the batch fails
  mid-gate (the r8 executor-storage-leak discipline).

Families: text MinHash, embedding LSH, media image/audio/video/auto,
and the round-12 per-frame video granularity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# --- family content generators -------------------------------------------


def _text(cls: int, words: range | None = None) -> str:
    r = words if words is not None else range(60)
    return " ".join(f"w{cls}x{j}" for j in r)


def _emb(cls: int, angle_deg: float = 0.0) -> list:
    """Unit vector in the (2*cls, 2*cls+1) plane of an 8-d space,
    rotated by angle_deg — distinct classes are orthogonal."""
    v = [0.0] * 8
    a = np.deg2rad(angle_deg)
    v[(2 * cls) % 8] = float(np.cos(a))
    v[(2 * cls + 1) % 8] = float(np.sin(a))
    return v


def _image(cls: int) -> bytes:
    from sqlserver_pg_cdc_spark.operators.multimodal import encode_bmp

    y, x = np.mgrid[0:64, 0:64]
    g = (
        37 * ((x * (cls + 2)) // 16) + 59 * ((y * (cls + 3)) // 16)
        + 29 * (((x + y) * (cls + 1)) // 32) + cls * 41
    ) % 256
    px = np.stack([g.astype(np.uint8)] * 3, axis=2)
    return encode_bmp(64, 64, px.tobytes())


def _image_chain() -> list:
    """Three lossless BMP block-checkers forming a pHash CHAIN:
    ham(X,Y)=6, ham(Y,Z)=6 (direct at the gate's max_hamming 6),
    ham(X,Z)=10 (transitive only). Found by search over 2-block
    flips; BMP is lossless so the triple is bit-deterministic."""
    from sqlserver_pg_cdc_spark.operators.multimodal import encode_bmp

    X = np.array(
        [[0, 0, 1, 1, 1, 0, 1, 0], [0, 0, 1, 1, 0, 0, 0, 1],
         [1, 0, 0, 0, 1, 0, 1, 0], [1, 0, 1, 1, 0, 0, 0, 0],
         [1, 1, 0, 1, 0, 1, 0, 1], [0, 1, 1, 1, 1, 0, 1, 0],
         [0, 1, 1, 1, 1, 1, 0, 1], [1, 1, 1, 0, 0, 0, 1, 0]],
        dtype=np.uint8,
    )
    Y = X.copy()
    Y.flat[[31, 44]] ^= 1
    Z = Y.copy()
    Z.flat[[25, 60]] ^= 1

    def enc(bits):
        base = np.where(
            np.kron(bits, np.ones((8, 8), dtype=np.uint8)) > 0, 225, 30
        ).astype(np.uint8)
        px = np.stack([base, base, base], axis=2)
        return encode_bmp(64, 64, px.tobytes())

    return [enc(X), enc(Y), enc(Z)]


def _audio(cls: int) -> bytes:
    from sqlserver_pg_cdc_spark.operators.multimodal import encode_wav_pcm16

    n = 4000
    t = np.arange(n)
    s2 = 6000 * np.sign(np.sin(2 * np.pi * t * (cls + 2) / 128)) + 4000 * (
        np.sign(np.sin(2 * np.pi * t * (2 * cls + 5) / 512))
    )
    env = 1 + ((t * (cls + 3)) // n)
    x = np.clip((s2.astype(np.int64) * env) // 4, -32767, 32767).astype(
        np.int16
    )
    return encode_wav_pcm16(8000, x)


def _video(cls: int, scenes: range | None = None) -> bytes:
    from sqlserver_pg_cdc_spark.operators.multimodal import encode_mcv
    from sqlserver_pg_cdc_spark.workload import _recut_scene

    idxs = scenes if scenes is not None else range(8)
    return encode_mcv(
        [_recut_scene(cls, f) for f in idxs], fps=10, gop=4, qscale=4
    )


# --- family registry ------------------------------------------------------


def _mk_text(spark, tmp_path, **kw):
    from sqlserver_pg_cdc_spark.streaming.minhash import DedupGateSink

    return DedupGateSink(
        spark, str(tmp_path / "state"), str(tmp_path / "dups"),
        "doc_id", "text", threshold=0.65, num_hashes=32, bands=16,
        n_partitions=4, **kw,
    )


def _mk_emb(spark, tmp_path, **kw):
    from sqlserver_pg_cdc_spark.streaming.ann import AnnGateSink

    return AnnGateSink(
        spark, str(tmp_path / "state"), str(tmp_path / "dups"),
        "doc_id", "embedding", threshold=0.99, dim=8,
        n_partitions=4, **kw,
    )


def _mk_media(media, granularity="clip"):
    def mk(spark, tmp_path, **kw):
        from sqlserver_pg_cdc_spark.streaming.media import MediaDedupGateSink

        extra = {}
        if granularity != "clip":
            extra = {"granularity": granularity, "min_match_frames": 2}
        return MediaDedupGateSink(
            spark, str(tmp_path / "state"), str(tmp_path / "dups"),
            "doc_id", "payload", n_partitions=4, media=media,
            **extra, **kw,
        )
    return mk


FAMILIES = {
    "text": {
        "make": _mk_text,
        "schema": "doc_id long, text string",
        "content": _text,
        # J(X,Y)=J(Y,Z)=70/90=0.78 >= 0.65 > J(X,Z)=60/100=0.6
        "chain": [
            _text(0, range(0, 80)), _text(0, range(10, 90)),
            _text(0, range(20, 100)),
        ],
        "score": "jaccard",
    },
    "embedding": {
        "make": _mk_emb,
        "schema": "doc_id long, embedding array<double>",
        "content": _emb,
        # cos(0,5)=cos(5,10)=0.9962 >= 0.99 > cos(0,10)=0.9848
        "chain": [_emb(0, 0.0), _emb(0, 5.0), _emb(0, 10.0)],
        "score": "cosine",
    },
    "image": {
        "make": _mk_media("image"),
        "schema": "doc_id long, payload binary",
        "content": _image,
        # ham(X,Y)=ham(Y,Z)=6 <= max_hamming 6 < ham(X,Z)=10
        "chain": _image_chain(),
        "score": "hamming",
    },
    "audio": {
        "make": _mk_media("audio"),
        "schema": "doc_id long, payload binary",
        "content": _audio,
        "chain": None,
        "score": "hamming",
    },
    "video": {
        "make": _mk_media("video"),
        "schema": "doc_id long, payload binary",
        "content": _video,
        "chain": None,
        "score": "hamming",
    },
    "auto": {
        "make": _mk_media("auto"),
        "schema": "doc_id long, payload binary",
        "content": _image,
        "chain": None,
        "score": "hamming",
    },
    "video-frame": {
        "make": _mk_media("video", granularity="frame"),
        "schema": "doc_id long, payload binary",
        "content": _video,
        # scene windows 0..3 / 2..5 / 4..7: adjacent share 2 scenes
        # (= min_match_frames), ends share none — bit-exact, so the
        # chain is fully deterministic
        "chain": [
            _video(0, range(0, 4)), _video(0, range(2, 6)),
            _video(0, range(4, 8)),
        ],
        "score": "hamming",
    },
}

ALL = sorted(FAMILIES)
CHAINED = sorted(k for k in FAMILIES if FAMILIES[k]["chain"])


def _df(spark, fam, rows):
    cols = [c.split()[0] for c in fam["schema"].split(",")]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=cols), fam["schema"]
    )


def _log(gate):
    df = gate.dup_log()
    return {} if df is None else {r["doc"]: r.asDict() for r in df.collect()}


def _indexed(gate):
    live = gate._live_state() if hasattr(gate, "_live_state") else None
    if live is None:
        st = gate.read_target()
        if st is not None and "__del" in st.columns:
            st = st.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        live = st
    return {r["doc"] for r in live.select("doc").collect()}


@pytest.mark.parametrize("name", ALL)
def test_within_batch_min_id_dtype_and_replay(spark, tmp_path, name):
    fam = FAMILIES[name]
    gate = fam["make"](spark, tmp_path)
    c = fam["content"]
    batch = _df(spark, fam, [(30, c(0)), (10, c(0)), (20, c(0)),
                             (40, c(3))])
    gate(batch, 0)
    log = _log(gate)
    assert set(log) == {20, 30}
    for d in (20, 30):
        assert log[d]["dup_of"] == 10 and log[d]["kind"] == "batch"
        # identical content: every pair is direct, scores non-NULL
        assert log[d][fam["score"]] is not None
    assert _indexed(gate) == {10, 40}
    # dup-log id dtype pinned to the stored key dtype
    ldf = gate.dup_log()
    assert dict(ldf.dtypes)["doc"] == dict(
        gate.read_target().dtypes
    )["doc"]
    # replay: the generation is overwritten — same rejected docs, same
    # canonical, index unchanged. `kind` may flip batch->corpus (the
    # canonical is indexed by now, so the replayed losers reject at the
    # cross-corpus probe instead), which is the SAME decision earlier.
    gate(batch, 0)
    relog = _log(gate)
    assert {d: r["dup_of"] for d, r in relog.items()} == {
        d: r["dup_of"] for d, r in log.items()
    }
    assert _indexed(gate) == {10, 40}


@pytest.mark.parametrize("name", ALL)
def test_cross_corpus_best_match_ties_to_smallest_indexed_id(
    spark, tmp_path, name
):
    fam = FAMILIES[name]
    gate = fam["make"](spark, tmp_path)
    c = fam["content"]
    # force-index two IDENTICAL docs through the index seam (the gate
    # itself would dedup them) so the probe sees a genuine score tie
    seed = _df(spark, fam, [(20, c(0)), (21, c(0))])
    gate._upsert_projected(gate._project(seed, 0), 0)
    assert _indexed(gate) == {20, 21}
    gate(_df(spark, fam, [(50, c(0)), (60, c(5))]), 1)
    log = _log(gate)
    assert set(log) == {50}
    assert log[50]["dup_of"] == 20  # tie -> smallest indexed id
    assert log[50]["kind"] == "corpus"
    assert _indexed(gate) == {20, 21, 60}


@pytest.mark.parametrize("name", ALL)
def test_cdc_deletes_bypass_gate_and_retire_from_probe(
    spark, tmp_path, name
):
    fam = FAMILIES[name]
    gate = fam["make"](
        spark, tmp_path, lsn_col="lsn", deleted_col="__deleted"
    )
    c = fam["content"]
    schema = fam["schema"] + ", lsn long, __deleted string"
    cols = [s.split()[0] for s in schema.split(",")]

    def rows(recs):
        return spark.createDataFrame(
            pd.DataFrame(recs, columns=cols), schema
        )

    gate(rows([(1, c(0), 10, "false")]), 0)
    assert _indexed(gate) == {1}
    # the delete bypasses the gate (no dup-log row) and retires doc 1
    gate(rows([(1, None, 20, "true")]), 1)
    assert _log(gate) == {}
    assert _indexed(gate) == set()
    # a same-class doc now passes un-gated: the probe no longer sees 1
    gate(rows([(2, c(0), 30, "false")]), 2)
    assert _log(gate) == {}
    assert _indexed(gate) == {2}


@pytest.mark.parametrize("name", CHAINED)
def test_transitive_losers_log_null_score(spark, tmp_path, name):
    fam = FAMILIES[name]
    gate = fam["make"](spark, tmp_path)
    a, b, cch = fam["chain"]
    gate(_df(spark, fam, [(100, a), (101, b), (102, cch)]), 0)
    log = _log(gate)
    assert set(log) == {101, 102}
    assert log[101]["dup_of"] == 100 and log[102]["dup_of"] == 100
    assert log[101][fam["score"]] is not None  # direct neighbor
    assert log[102][fam["score"]] is None      # linked transitively
    assert _indexed(gate) == {100}


@pytest.mark.parametrize("name", ALL)
def test_blocks_unpersist_even_when_batch_fails(spark, tmp_path, name):
    fam = FAMILIES[name]
    gate = fam["make"](spark, tmp_path)
    c = fam["content"]
    gate(_df(spark, fam, [(1, c(0))]), 0)
    captured = []
    orig = gate._gate_batch_pairs

    def spy(surface, reject_docs, blocks):
        out = orig(surface, reject_docs, blocks)
        captured.append(out)
        return out

    gate._gate_batch_pairs = spy
    boom = RuntimeError("injected upsert failure")
    orig_upsert = gate._upsert_projected

    def fail(*a, **kw):
        raise boom

    gate._upsert_projected = fail
    with pytest.raises(RuntimeError, match="injected"):
        gate(_df(spark, fam, [(2, c(1)), (3, c(2))]), 1)
    gate._gate_batch_pairs = orig
    gate._upsert_projected = orig_upsert
    assert captured, "spy never ran"
    for blk in captured:
        assert not blk.storageLevel.useMemory and \
            not blk.storageLevel.useDisk, "persisted block leaked"
