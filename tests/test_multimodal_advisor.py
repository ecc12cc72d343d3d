"""Multimodal plumbing, plan advisor, JDBC option builders."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators.multimodal import (
    binary_features,
    binary_features_sql,
    decode_images,
    resize_images_stub,
    sample_audio_frames,
    with_metadata,
)
from sqlserver_pg_cdc_spark.plans.advisor import analyze_plan, recommend_layout
from sqlserver_pg_cdc_spark.sources.jdbc import (
    JdbcConfig,
    incremental_poll_query,
    on_conflict_upsert_sql,
    partitioned_read_options,
    upsert_write_options,
)
from tests.conftest import load


def _binary_docs(spark):
    return (
        load(spark, "documents")
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )


# --- multimodal -----------------------------------------------------------

def test_binary_features_oracle_parity(spark, duck):
    df = _binary_docs(spark)
    got = sorted(tuple(r) for r in binary_features(df, "doc_id", "payload").collect())
    want = sorted(
        tuple(r)
        for r in duck.execute(
            binary_features_sql(
                "(SELECT doc_id, encode(text) AS payload FROM documents)",
                "doc_id",
                "payload",
            )
        ).fetchall()
    )
    assert got == want


def test_with_metadata_struct(spark):
    df = with_metadata(_binary_docs(spark), "payload", mime="text/plain")
    row = df.filter(F.col("doc_id") == 0).collect()[0]["metadata"]
    assert row["mime"] == "text/plain"
    assert row["n_bytes"] > 0
    assert row["width"] is None and row["sample_rate"] is None


def test_decode_images_fake_deterministic(spark):
    df = _binary_docs(spark).limit(50)
    a = {r["doc_id"]: tuple(r) for r in decode_images(df, "doc_id", "payload").collect()}
    b = {r["doc_id"]: tuple(r) for r in decode_images(df, "doc_id", "payload").collect()}
    assert a == b  # deterministic fake
    some = next(iter(a.values()))
    assert 64 <= some[1] <= 255 and 64 <= some[2] <= 255 and some[3] == 3
    assert 0.0 <= some[4] <= 1.0


def test_decode_images_strict_raises(spark):
    df = _binary_docs(spark).limit(2)
    with pytest.raises(Exception) as ei:
        decode_images(df, "doc_id", "payload", decoder="strict").collect()
    assert "NotImplementedError" in str(ei.value) or "image library" in str(ei.value)


def test_audio_frame_fanout(spark):
    df = _binary_docs(spark).limit(10)
    frames = sample_audio_frames(df, "doc_id", "payload", frame_ms=500).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 10
    for doc_frames in by_doc.values():
        idxs = sorted(f["frame_idx"] for f in doc_frames)
        assert idxs == list(range(len(idxs)))  # dense frame indices
        assert all(f["frame_offset_ms"] == f["frame_idx"] * 500 for f in doc_frames)
        assert all(f["rms"] >= 0 for f in doc_frames)


def test_bmp_roundtrip_known_pixels():
    from sqlserver_pg_cdc_spark.operators.multimodal import decode_bmp, encode_bmp

    # 3x2, odd row width (9 bytes -> 3 pad bytes/row) exercises padding
    px = bytes(range(18))
    bmp = encode_bmp(3, 2, px)
    w, h, ch, sm, n = decode_bmp(bmp)
    assert (w, h, ch, n) == (3, 2, 3, 18)
    assert sm == sum(range(18))  # padding bytes NOT counted


def test_bmp_decode_rejects_garbage_and_truncation():
    from sqlserver_pg_cdc_spark.operators.multimodal import decode_bmp, encode_bmp

    assert decode_bmp(b"not a bmp at all padding padding padding padding") is None
    bmp = encode_bmp(4, 4, bytes(48))
    assert decode_bmp(bmp[:-5]) is None  # truncated pixel data
    assert decode_bmp(None) is None


def test_bmp_decode_topdown_negative_height():
    import struct as S

    from sqlserver_pg_cdc_spark.operators.multimodal import decode_bmp, encode_bmp

    bmp = bytearray(encode_bmp(2, 3, bytes(range(18))))
    S.pack_into("<i", bmp, 22, -3)  # top-down flag
    w, h, ch, sm, n = decode_bmp(bytes(bmp))
    assert (w, h, sm) == (2, 3, sum(range(18)))


def test_decode_images_bmp_real(spark):
    from sqlserver_pg_cdc_spark.operators.multimodal import encode_bmp

    rows = [
        (1, encode_bmp(2, 2, bytes([10] * 12))),
        (2, b"corrupt"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in
           decode_images(df, "doc_id", "payload", decoder="bmp").collect()}
    assert got[1]["width"] == 2 and got[1]["height"] == 2
    assert got[1]["mean_pixel"] == pytest.approx(10 / 255)
    assert got[2]["width"] is None and got[3]["width"] is None


def test_wav_truncated_data_chunk_rejected():
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    wav = encode_wav_pcm16(8000, list(range(100)))
    assert decode_wav_pcm16(wav[:-7]) is None  # cut mid-data-chunk


def test_wav_roundtrip_and_frame_rms(spark):
    import math

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [100, -100, 200, -200]
    wav = encode_wav_pcm16(4, samples)  # 4 Hz -> 4 samples = 1000 ms
    rate, back = decode_wav_pcm16(wav)
    assert rate == 4 and list(back) == samples
    df = spark.createDataFrame([(1, wav), (2, b"nope")], "doc_id long, payload binary")
    frames = sample_audio_frames(
        df, "doc_id", "payload", frame_ms=500, decoder="wav"
    ).collect()
    # 4 samples at 4 Hz, 500 ms windows -> 2 samples per frame, 2 frames
    assert [r["doc_id"] for r in frames] == [1, 1]
    assert frames[0]["rms"] == pytest.approx(
        math.sqrt((100 * 100 + 100 * 100) / 2)
    )
    assert frames[1]["frame_offset_ms"] == 500


def test_resize_stub_raises(spark):
    df = _binary_docs(spark).limit(1)
    with pytest.raises(Exception):
        resize_images_stub(df, "doc_id", "payload", 224, 224).collect()


# --- advisor --------------------------------------------------------------

def test_analyze_plan_detects_pushdown_and_joins(spark):
    li = load(spark, "lineitem").filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    m = analyze_plan(li)
    assert m.pushed_filters >= 1  # filter reached the parquet scan
    assert not m.has_cartesian

    orders = load(spark, "orders")
    joined = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
    mj = analyze_plan(joined)
    assert any("BroadcastHashJoin" in j for j in mj.joins)


def test_analyze_plan_flags_cartesian(spark):
    a = load(spark, "region")
    b = load(spark, "nation")
    m = analyze_plan(a.crossJoin(b))
    assert m.has_cartesian
    assert any("cartesian" in w for w in m.warnings)


def test_recommend_layout():
    class FakeDF:
        columns = [f"c{i}" for i in range(25)]

    recs = recommend_layout(FakeDF(), join_keys=["pk"], filter_keys=["ds"])
    assert any("bucket" in r for r in recs)
    assert any("partition" in r for r in recs)
    assert any("25 columns" in r for r in recs)


# --- jdbc builders --------------------------------------------------------

def test_jdbc_builders():
    cfg = JdbcConfig("jdbc:postgresql://h/db", "u", "p", driver="org.postgresql.Driver")
    assert cfg.properties()["driver"] == "org.postgresql.Driver"

    opts = partitioned_read_options("t", "id", 0, 1000, num_partitions=8)
    assert opts["numPartitions"] == "8" and opts["partitionColumn"] == "id"

    q = incremental_poll_query("cdc.t_CT", "__$start_lsn", 123,
                               order_columns=["__$start_lsn", "__$seqval"])
    # default dialect targets SQL Server CT tables: TOP, not LIMIT
    assert q == (
        "SELECT TOP 2048 * FROM cdc.t_CT WHERE __$start_lsn > 123 "
        "ORDER BY __$start_lsn, __$seqval"
    )
    q_pg = incremental_poll_query("t_changes", "lsn", 123, dialect="postgresql")
    assert q_pg.endswith("ORDER BY lsn LIMIT 2048")

    up = upsert_write_options("t", ["id"], batch_size=3000)
    assert up["insert.mode"] == "upsert" and up["batchsize"] == "3000"

    sql = on_conflict_upsert_sql("t", ["id", "a", "b"], ["id"])
    assert "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b" in sql


# --- PNG codec: the compressed-format path (stdlib zlib, no image lib) ---


def test_png_paeth_predictor_spec_cases():
    """Paeth (PNG spec §6.6): nearest of a/b/c to p=a+b-c, ties broken
    left, then up, then up-left — hand-computed cases, not round-trip."""
    from sqlserver_pg_cdc_spark.operators.multimodal import _paeth

    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 5) == 20   # p=25: |25-10|=15, |25-20|=5, |25-5|=20
    assert _paeth(20, 10, 5) == 20   # p=25: pa=5 wins
    assert _paeth(10, 20, 30) == 10  # p=0: pa=10, pb=20, pc=30
    assert _paeth(5, 5, 5) == 5      # all equal -> left
    assert _paeth(100, 2, 3) == 100  # p=99: pa=1, pb=97, pc=96 -> left


def test_png_filter0_ground_truth_handbuilt():
    """A PNG hand-assembled in the test (signature, chunks, CRCs, zlib)
    with filter-0 scanlines — the decompressed stream IS the pixels, so
    this checks the decoder against the wire format independently of
    encode_png."""
    import struct as S
    import zlib as Z

    from sqlserver_pg_cdc_spark.operators.multimodal import decode_png

    def chunk(typ, body):
        return S.pack(">I", len(body)) + typ + body + S.pack(
            ">I", Z.crc32(typ + body) & 0xFFFFFFFF
        )

    w, h = 2, 3  # RGB, stride 6
    rows = [bytes(range(r * 6, r * 6 + 6)) for r in range(h)]
    raw = b"".join(b"\x00" + r for r in rows)
    # one zlib stream carried by TWO IDAT chunks (spec-legal split)
    comp = Z.compress(raw)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", S.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"tEXt", b"Comment\x00ancillary chunk is skipped")
        + chunk(b"IDAT", comp[:5])
        + chunk(b"IDAT", comp[5:])
        + chunk(b"IEND", b"")
    )
    assert decode_png(png) == (w, h, 3, sum(range(18)), 18)


def test_png_roundtrip_every_filter_rgb_rgba():
    from sqlserver_pg_cdc_spark.operators.multimodal import decode_png, encode_png

    for ch in (3, 4):
        for f in range(5):  # force a single filter type per image
            px = bytes((i * 11 + f) % 256 for i in range(5 * 4 * ch))
            png = encode_png(5, 4, px, channels=ch, filters=[f] * 4)
            assert decode_png(png) == (5, 4, ch, sum(px), len(px)), (ch, f)
    # default cycling filters (0..4 across rows)
    px = bytes((i * 7) % 256 for i in range(6 * 5 * 3))
    assert decode_png(encode_png(6, 5, px)) == (6, 5, 3, sum(px), len(px))


def test_png_rejects_corrupt_truncated_unsupported():
    import struct as S
    import zlib as Z

    from sqlserver_pg_cdc_spark.operators.multimodal import decode_png, encode_png

    png = encode_png(4, 4, bytes(48), channels=3, filters=[0, 1, 2, 3])
    assert decode_png(png[:-6]) is None          # truncated (IEND cut)
    assert decode_png(png[:20]) is None          # truncated mid-IHDR
    assert decode_png(None) is None
    assert decode_png(b"\xff\xd8\xff\xe0 jpeg magic not png") is None
    bad = bytearray(png)
    bad[45] ^= 0xFF                              # corrupt a body byte -> CRC fail
    assert decode_png(bytes(bad)) is None

    def chunk(typ, body):
        return S.pack(">I", len(body)) + typ + body + S.pack(
            ">I", Z.crc32(typ + body) & 0xFFFFFFFF
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # 16-bit depth: declared out of scope -> None, not garbage values
    deep = (
        sig
        + chunk(b"IHDR", S.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", Z.compress(bytes(26)))
        + chunk(b"IEND", b"")
    )
    assert decode_png(deep) is None
    # unknown scanline filter type 7 -> None
    raw = b"\x07" + bytes(6)
    bad_filter = (
        sig
        + chunk(b"IHDR", S.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", Z.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert decode_png(bad_filter) is None
    # wrong decompressed length (one scanline missing) -> None
    short = (
        sig
        + chunk(b"IHDR", S.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", Z.compress(b"\x00" + bytes(6)))
        + chunk(b"IEND", b"")
    )
    assert decode_png(short) is None


def test_decode_images_png_and_auto(spark):
    from sqlserver_pg_cdc_spark.operators.multimodal import encode_bmp, encode_png

    rows = [
        (1, encode_png(2, 2, bytes([20] * 12))),
        (2, encode_png(2, 2, bytes([40] * 16), channels=4)),
        (3, b"corrupt payload"),
        (4, encode_bmp(2, 2, bytes([10] * 12))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in
           decode_images(df, "doc_id", "payload", decoder="png").collect()}
    assert got[1]["channels"] == 3 and got[1]["mean_pixel"] == pytest.approx(20 / 255)
    assert got[2]["channels"] == 4 and got[2]["mean_pixel"] == pytest.approx(40 / 255)
    assert got[3]["width"] is None
    assert got[4]["width"] is None  # BMP is not PNG under decoder="png"
    # auto: magic-byte dispatch decodes both formats in one pass
    auto = {r["doc_id"]: r for r in
            decode_images(df, "doc_id", "payload", decoder="auto").collect()}
    assert auto[1]["width"] == 2 and auto[4]["width"] == 2
    assert auto[4]["mean_pixel"] == pytest.approx(10 / 255)
    assert auto[3]["width"] is None


def test_png_zip_bomb_rejected_without_full_inflation():
    """A crafted payload whose IHDR declares a tiny image but whose
    IDAT inflates to ~64 MB must be rejected via the BOUNDED
    decompressor (output capped at the IHDR-derived size), not after
    allocating the whole expansion."""
    import struct as S
    import time as T
    import zlib as Z

    from sqlserver_pg_cdc_spark.operators.multimodal import decode_png

    def chunk(typ, body):
        return S.pack(">I", len(body)) + typ + body + S.pack(
            ">I", Z.crc32(typ + body) & 0xFFFFFFFF
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", S.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))  # 2x2 RGB
    bomb = Z.compress(b"\x00" * (64 * 1024 * 1024), 9)  # ~64KB compressed
    payload = sig + ihdr + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    t0 = T.time()
    assert decode_png(payload) is None
    assert T.time() - t0 < 1.0  # bounded: never inflates the 64 MB


def test_png_corrupt_payloads_null_through_catalog_path(spark):
    """Corrupt/truncated/bomb payloads through decode_images (the
    catalog multimodal_png_decode path): NULL rows for every bad
    payload, real dims for the one valid control."""
    import struct as S
    import zlib as Z

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_images,
        encode_png,
    )

    good = encode_png(4, 3, bytes(range(36)), channels=3)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a bit in IEND's CRC
    def chunk(typ, body):
        return S.pack(">I", len(body)) + typ + body + S.pack(
            ">I", Z.crc32(typ + body) & 0xFFFFFFFF
        )
    sig = b"\x89PNG\r\n\x1a\n"
    bomb = (
        sig
        + chunk(b"IHDR", S.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", Z.compress(b"\x00" * (8 * 1024 * 1024), 9))
        + chunk(b"IEND", b"")
    )
    rows = [
        (1, good),
        (2, good[: len(good) // 2]),     # truncated mid-chunk
        (3, bytes(bad_crc)),             # CRC mismatch
        (4, b"\x00" * 64),               # not a PNG
        (5, bomb),                       # declared 2x2, inflates 8 MB
        (6, None),                       # NULL payload
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["channels"])
        for r in decode_images(df, "doc_id", "payload", decoder="png").collect()
    }
    assert got[1] == (4, 3, 3)
    for k in (2, 3, 4, 5, 6):
        assert got[k] == (None, None, None), k


def test_jpeg_solid_even_gray_roundtrips_exactly():
    """Solid even-gray blocks: the single DC coefficient (8*(g-128)) is
    divisible by the flat quant step 16, so the full
    encode->huffman->decode->IDCT pipeline must return the EXACT input
    sum — the property the analytic oracle rides."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    for w, h, ch, g in [(8, 8, 3, 0), (16, 8, 1, 254), (24, 16, 3, 100), (10, 6, 3, 64)]:
        p = encode_jpeg(w, h, bytes([g]) * (w * h * ch), channels=ch)
        assert decode_jpeg(p) == (w, h, ch, w * h * ch * g, w * h * ch), (w, h, ch, g)


def test_jpeg_nonsolid_matches_independent_reference():
    """Arbitrary content: decoder output must equal an INDEPENDENT
    numpy reference of the same math (forward DCT -> quantize ->
    dequant -> IDCT -> clamp), proving the Huffman/zigzag/bitstream
    plumbing is lossless around the lossy quantization step."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _IDCT_M,
        _JPEG_QTABLE,
        _JPEG_ZIGZAG,
        decode_jpeg,
        encode_jpeg,
    )

    w = h = 8
    vals = [(x * 17 + 7) % 256 for x in range(w * h)]
    p = encode_jpeg(w, h, bytes(vals), channels=1)
    got = decode_jpeg(p)
    assert got is not None
    # independent reference (grayscale: no color conversion in the loop)
    q = np.array(_JPEG_QTABLE, dtype=np.float64)[np.argsort(_JPEG_ZIGZAG)].reshape(8, 8)
    block = np.array(vals, dtype=np.float64).reshape(8, 8) - 128.0
    coef = _IDCT_M @ block @ _IDCT_M.T
    deq = np.round(coef / q) * q
    pix = _IDCT_M.T @ deq @ _IDCT_M + 128.0
    want_sum = int(np.clip(np.round(pix), 0, 255).astype(np.int64).sum())
    assert got == (w, h, 1, want_sum, w * h)


def test_jpeg_corrupt_payloads_null_through_catalog_path(spark):
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_images,
        encode_jpeg,
    )

    good = encode_jpeg(8, 8, bytes([100]) * (8 * 8 * 3), channels=3)
    rows = [
        (1, good),
        (2, good[: len(good) // 3]),   # truncated in the header walk
        (3, good[:-2]),                # EOI missing
        (4, b"\xff\xd8" + b"\x00" * 40),  # SOI then garbage
        (5, b"GIF89a" + b"\x00" * 40),    # not a JPEG at all
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["channels"])
        for r in decode_images(df, "doc_id", "payload", decoder="jpeg").collect()
    }
    assert got[1] == (8, 8, 3)
    for k in (2, 3, 4, 5, 6):
        assert got[k] == (None, None, None), k


def test_auto_sniff_dispatches_all_three_codecs(spark):
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_images,
        encode_bmp,
        encode_jpeg,
        encode_png,
    )

    rows = [
        (1, encode_bmp(4, 2, bytes(range(24)))),
        (2, encode_png(4, 2, bytes(range(24)), channels=3)),
        (3, encode_jpeg(8, 8, bytes([50]) * 192, channels=3)),
        (4, b"plain text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"])
        for r in decode_images(df, "doc_id", "payload", decoder="auto").collect()
    }
    assert got[1] == (4, 2) and got[2] == (4, 2) and got[3] == (8, 8)
    assert got[4] == (None, None)


def test_resize_images_real_nearest_neighbor(spark):
    """BMP resize is real: integer downscale of a 2x2-block pattern
    samples exact source pixels; solid stays solid; corrupt -> NULL."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_images,
    )

    # 4x4 image of 2x2 blocks with values 10/20/30/40 per channel
    blocks = [[10, 20], [30, 40]]
    px = bytearray()
    for y in range(4):
        for x in range(4):
            px += bytes([blocks[y // 2][x // 2]]) * 3
    src = encode_bmp(4, 4, bytes(px))
    rows = [(1, src), (2, b"not a bmp"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in resize_images(df, "doc_id", "payload", 2, 2).collect()
    }
    assert out[2]["payload"] is None and out[3]["payload"] is None
    resized = bytes(out[1]["payload"])
    parsed = decode_bmp(resized)
    assert parsed is not None and parsed[0] == 2 and parsed[1] == 2
    # floor(i*4/2) = 0,2 -> samples the top-left pixel of each block
    assert parsed[3] == (10 + 20 + 30 + 40) * 3
    # solid image stays solid at any scale
    solid = encode_bmp(3, 5, bytes([77]) * 45)
    df2 = spark.createDataFrame([(9, solid)], "doc_id long, payload binary")
    (r2,) = resize_images(df2, "doc_id", "payload", 7, 2).collect()
    p2 = decode_bmp(bytes(r2["payload"]))
    assert p2 == (7, 2, 3, 7 * 2 * 3 * 77, 7 * 2 * 3)


def test_mjpeg_split_respects_marker_structure():
    """split_mjpeg must walk markers, not byte-search: a quant table
    containing the bytes FF D9 must not truncate the frame."""
    import struct as S

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        split_mjpeg,
    )

    f1 = encode_jpeg(8, 8, bytes([100]) * 192, channels=3)
    # craft a variant with an extra COM segment whose body contains FF D9
    com_body = b"\x00\xff\xd9\x00"
    com = b"\xff\xfe" + S.pack(">H", len(com_body) + 2) + com_body
    f2 = f1[:2] + com + f1[2:]
    assert decode_jpeg(f2) == decode_jpeg(f1)  # COM is skipped
    stream = f2 + f1 + f2
    spans = split_mjpeg(stream)
    assert len(spans) == 3
    assert [e - s for s, e in spans] == [len(f2), len(f1), len(f2)]


def test_sample_video_frames_real_mjpeg(spark):
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_jpeg,
        encode_mjpeg,
        sample_video_frames,
    )

    grays = [10, 20, 30, 40, 50]
    frames = [encode_jpeg(8, 8, bytes([g]) * 192, channels=3) for g in grays]
    stream = encode_mjpeg(frames)
    df = spark.createDataFrame([(1, stream)], "doc_id long, payload binary")
    got = {
        r["frame_idx"]: (r["frame_offset_ms"], r["width"], r["mean_pixel"])
        for r in sample_video_frames(
            df, "doc_id", "payload", fps=25, stride=2, max_frames=8
        ).collect()
    }
    # every 2nd frame of 5: source indices 0, 2, 4; offsets at 25 fps
    assert sorted(got) == [0, 2, 4]
    for idx in (0, 2, 4):
        off, w, mean = got[idx]
        assert off == idx * 40 and w == 8
        assert mean == grays[idx] / 255
    # a corrupted 2nd frame truncates the stream after frame 0
    bad = frames[0] + frames[1][: len(frames[1]) // 2]
    df2 = spark.createDataFrame([(2, bad)], "doc_id long, payload binary")
    rows = sample_video_frames(df2, "doc_id", "payload", stride=1).collect()
    assert len(rows) == 1 and rows[0]["mean_pixel"] == grays[0] / 255


def test_adpcm_spec_tables_and_roundtrip():
    """Step/index tables pinned to the IMA spec endpoints; 4:1-class
    compression; roundtrip SNR bound; constant signals exact after the
    seeded first sample; corruption -> None."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _ADPCM_INDEX_ADJ,
        _ADPCM_STEPS,
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    assert len(_ADPCM_STEPS) == 89
    assert _ADPCM_STEPS[0] == 7 and _ADPCM_STEPS[-1] == 32767
    assert _ADPCM_INDEX_ADJ == [-1, -1, -1, -1, 2, 4, 6, 8]
    n = 2048
    t = np.arange(n)
    sig = (9000 * np.sin(t / 17.0)).astype(np.int16)
    p = encode_wav_adpcm(16000, sig)
    assert len(p) < n * 2 / 3  # genuinely compressed (4:1 minus headers)
    rate, out = decode_wav_adpcm(p)
    assert rate == 16000 and len(out) == n
    err = out.astype(np.int64) - sig.astype(np.int64)
    snr = 10 * np.log10(
        (sig.astype(np.int64) ** 2).mean() / max(1, (err ** 2).mean())
    )
    assert snr > 20, snr
    const = np.full(700, -555, dtype=np.int16)
    _, rc = decode_wav_adpcm(encode_wav_adpcm(8000, const))
    assert int(np.abs(rc.astype(int) + 555).max()) == 0
    assert decode_wav_adpcm(p[: len(p) // 2]) is None
    assert decode_wav_adpcm(b"RIFFxxxxWAVE" + b"\x00" * 64) is None


def test_audio_frames_adpcm_through_spark(spark):
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_wav_adpcm,
        sample_audio_frames,
    )

    sig = (5000 * np.sin(np.arange(4000) / 9.0)).astype(np.int16)
    p = encode_wav_adpcm(2000, sig)  # 2 seconds at 2 kHz
    df = spark.createDataFrame(
        [(1, p), (2, b"not audio"), (3, None)], "doc_id long, payload binary"
    )
    rows = sample_audio_frames(
        df, "doc_id", "payload", frame_ms=1000, decoder="adpcm"
    ).collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert sorted(r["frame_idx"] for r in rows) == [0, 1]
    for r in rows:
        assert 2500 < r["rms"] < 4500  # sine rms ≈ amplitude/sqrt(2)


def test_gif_decodes_real_world_encoder_outputs():
    """The LZW width convention must match REAL encoders: every
    well-formed GIF shipped with the local Python/Tcl installation must
    decode to its exact pixel count (a width mismatch desynchronizes
    the code stream and fails the strict count check). Truncated files
    must reject."""
    import glob

    from sqlserver_pg_cdc_spark.operators.multimodal import decode_gif

    files = sorted(
        glob.glob(
            "/mnt/sandboxing/model_tools_env/v1/python/install/lib/**/*.gif",
            recursive=True,
        )
    )
    if not files:
        import pytest

        pytest.skip("no real-world GIF corpus on this host")
    ok = sum(1 for f in files if decode_gif(open(f, "rb").read()) is not None)
    # all but the known-truncated earth.gif decode on this corpus
    assert ok >= len(files) - 2 and ok >= 10, (ok, len(files))


def test_gif_roundtrip_exact_with_dictionary_rollover():
    """GIF is lossless: encode->decode returns the exact palette-mapped
    sum, including on a noisy image large enough to roll the LZW
    dictionary past 4096 entries (clear-code reset path)."""
    import random

    from sqlserver_pg_cdc_spark.operators.multimodal import decode_gif, encode_gif

    palette = [(i * 7 % 256, i * 13 % 256, i * 29 % 256) for i in range(64)]
    rnd = random.Random(7)
    w, h = 120, 90
    idx = bytes(rnd.randrange(64) for _ in range(w * h))
    want = sum(sum(palette[i]) for i in idx)
    assert decode_gif(encode_gif(w, h, palette, idx)) == (w, h, 3, want, w * h * 3)
    # tiny edge: 1x1, 1-color palette
    assert decode_gif(encode_gif(1, 1, [(9, 8, 7)], b"\x00")) == (1, 1, 3, 24, 3)


def test_gif_corrupt_payloads_null_through_catalog_path(spark):
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_images,
        encode_gif,
    )

    good = encode_gif(4, 3, [(10, 20, 30), (40, 50, 60)], bytes([0, 1] * 6))
    rows = [
        (1, good),
        (2, good[: len(good) // 2]),  # truncated
        (3, good[:-2]),               # trailer cut
        (4, b"GIF89a" + b"\x00" * 20),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"])
        for r in decode_images(df, "doc_id", "payload", decoder="gif").collect()
    }
    assert got[1] == (4, 3)
    for k in (2, 3, 4, 5):
        assert got[k] == (None, None), k


def test_jpeg_restart_intervals_decode_identically():
    """DRI + RST0-7 (T.81 E.1.4) are in scope: a JPEG encoded with any
    restart interval must decode to exactly the same result as the same
    pixels without restarts — the DC-predictor resets and byte-align
    resyncs cancel out."""
    import random

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = random.Random(6)
    for w, h, ch, ri in [(24, 16, 1, 2), (16, 16, 3, 1), (40, 8, 3, 3), (32, 32, 3, 7)]:
        vals = bytes(rng.randrange(256) for _ in range(w * h * ch))
        plain = decode_jpeg(encode_jpeg(w, h, vals, channels=ch))
        with_rst = encode_jpeg(w, h, vals, channels=ch, restart_interval=ri)
        assert b"\xff\xdd" in with_rst  # DRI segment present
        assert decode_jpeg(with_rst) == plain, (w, h, ch, ri)


def test_jpeg_restart_sequence_violation_returns_none():
    """A RSTn marker out of the mod-8 sequence means a desynchronized
    or corrupt scan — the decoder must NULL the row, not mis-decode."""
    import random

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = random.Random(7)
    vals = bytes(rng.randrange(256) for _ in range(24 * 16))
    p = encode_jpeg(24, 16, vals, channels=1, restart_interval=1)
    i = p.find(b"\xff\xd0")
    assert i > 0
    assert decode_jpeg(p[: i + 1] + bytes([0xD3]) + p[i + 2 :]) is None
    # truncating the scan at a restart marker also NULLs (underrun)
    assert decode_jpeg(p[: i + 2] + b"\xff\xd9") is None


def test_catalog_corruption_classes_are_decode_deterministic():
    """The multimodal catalog queries inject corruption for
    doc_id%13 in (5,9) and their SQL oracles mirror the outcome
    analytically — valid ONLY if every corrupt payload fails decode
    deterministically. Guard that over strided slices of each query's
    combo space (the full spaces were verified exhaustively once:
    768 JPEG / 900 GIF / 256 ADPCM / 400 MJPEG combos)."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_gif,
        decode_jpeg,
        decode_wav_adpcm,
        encode_gif,
        encode_jpeg,
        encode_mjpeg,
        encode_wav_adpcm,
        split_mjpeg,
    )
    from sqlserver_pg_cdc_spark.workload import _mm_corrupt

    for k in range(0, 768, 13):  # coprime stride walks all residues
        w, h, ch, g = 8 * (1 + k % 3), 8 * (1 + k % 2), 1 + 2 * (k % 2), 2 * ((k * 37) % 128)
        p = encode_jpeg(w, h, bytes([g]) * (w * h * ch), channels=ch)
        assert decode_jpeg(_mm_corrupt(p, 5)) is None
        assert decode_jpeg(_mm_corrupt(p, 9)) is None

    palette = [(i * 30, i * 20 + 5, i * 10 + 3) for i in range(8)]
    for k in range(0, 2520, 31):
        w, h = 1 + k % 9, 1 + k % 5
        idx = bytes((k * 7 + j * 3) % 8 for j in range(w * h))
        p = encode_gif(w, h, palette, idx)
        assert decode_gif(_mm_corrupt(p, 5)) is None
        assert decode_gif(_mm_corrupt(p, 9)) is None

    for k in range(0, 256, 7):
        c = ((k * 97) % 256 - 128) * 100
        p = encode_wav_adpcm(1000, np.full(500 * (1 + k % 4), c, dtype=np.int16))
        assert decode_wav_adpcm(_mm_corrupt(p, 5)) is None
        assert decode_wav_adpcm(_mm_corrupt(p, 9)) is None

    for k in range(0, 120, 7):
        frames = [
            encode_jpeg(16, 8, bytes([2 * ((k * 11 + i * 53) % 128)]) * 384, channels=3)
            for i in range(1 + k % 6)
        ]
        p = encode_mjpeg(frames)
        chopped = _mm_corrupt(p, 5, chop_tail=True)
        spans = split_mjpeg(chopped)
        assert len(spans) == len(frames) - 1  # exactly the last frame dies
        assert all(decode_jpeg(chopped[s:e]) is not None for s, e in spans)
        assert split_mjpeg(_mm_corrupt(p, 9)) == []

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        decode_wav_pcm16,
        encode_bmp,
        encode_png,
        encode_wav_pcm16,
    )

    for k in range(0, 256, 5):  # BMP combo space is lcm(16,8,256)=256
        w, h = 1 + k % 16, 1 + k % 8
        p = encode_bmp(w, h, bytes((k * 31 + i * 7) % 256 for i in range(w * h * 3)))
        assert decode_bmp(_mm_corrupt(p, 5)) is None
        assert decode_bmp(_mm_corrupt(p, 9)) is None

    for k in range(0, 1456, 17):  # PNG: lcm(13,7,2) x content
        w, h, ch = 1 + k % 13, 1 + k % 7, 3 + k % 2
        p = encode_png(w, h, bytes((k * 31 + i * 7) % 256 for i in range(w * h * ch)), channels=ch)
        assert decode_png(_mm_corrupt(p, 5)) is None
        assert decode_png(_mm_corrupt(p, 9)) is None

    for k in range(0, 1000, 29):  # WAV: n cycle is 1000
        n = 600 + k % 1000
        p = encode_wav_pcm16(1000, [((k * 7 + j * 13) % 4096) - 2048 for j in range(n)])
        assert decode_wav_pcm16(_mm_corrupt(p, 5)) is None
        assert decode_wav_pcm16(_mm_corrupt(p, 9)) is None


# --- FLAC: Rice-coded lossless audio -------------------------------------


def test_flac_lossless_roundtrip():
    """Losslessness IS the codec's contract: encode->decode must return
    the exact input samples for constant, ramp, sine, alternating-
    extreme, random, empty, and single-sample signals."""
    import random

    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )

    rng = random.Random(42)
    cases = [
        np.zeros(100, dtype=np.int16),
        np.full(5000, -1234, dtype=np.int16),
        np.arange(-3000, 3000, 3, dtype=np.int16),
        np.array([rng.randrange(-32768, 32768) for _ in range(4000)], dtype=np.int16),
        (1000 * np.sin(np.arange(7000) / 20)).astype(np.int16),
        np.array([], dtype=np.int16),
        np.array([7], dtype=np.int16),
        np.array([-32768, 32767] * 500, dtype=np.int16),
    ]
    for i, x in enumerate(cases):
        d = decode_flac(encode_flac(44100, x, block_size=1024))
        assert d is not None, i
        assert d[0] == 44100 and np.array_equal(x, d[1]), i


def test_flac_compresses_predictable_signals():
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import encode_flac

    x = (500 * np.sin(np.arange(8000) / 30)).astype(np.int16)
    assert len(encode_flac(1000, x)) < 2 * len(x) * 0.5  # >2x on smooth audio
    const = np.full(8000, 123, dtype=np.int16)
    assert len(encode_flac(1000, const)) < 200  # CONSTANT subframes


def _build_flac_stream(nb, subframe_bits, expected, rate=1000):
    """Hand-built mono-16 stream: STREAMINFO + one frame whose subframe
    payload comes from `subframe_bits(writer)` — exercises decoder-only
    paths (LPC, rice2, partitions, wasted bits) per RFC 9639."""
    import hashlib

    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _crc8,
        _crc16,
        _flac_utf8_number,
        _MsbWriter,
    )

    x = np.asarray(expected, dtype=np.int16)
    info = _MsbWriter()
    for v, n in ((nb, 16), (nb, 16), (0, 24), (0, 24), (rate, 20), (0, 3), (15, 5), (len(x), 36)):
        info.write(v, n)
    body = bytes(info.out) + hashlib.md5(x.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC") + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    hdr = _MsbWriter()
    for v, n in ((0b11111111111110, 14), (0, 1), (0, 1), (0b0111, 4), (0b0000, 4),
                 (0b0000, 4), (0b100, 3), (0, 1)):
        hdr.write(v, n)
    for b in _flac_utf8_number(0):
        hdr.write(b, 8)
    hdr.write(nb - 1, 16)
    hb = bytes(hdr.out)
    fr = _MsbWriter()
    for b in hb:
        fr.write(b, 8)
    fr.write(_crc8(hb), 8)
    subframe_bits(fr)
    fr.align()
    fb = bytes(fr.out)
    return bytes(out + fb + _crc16(fb).to_bytes(2, "big"))


def _rice_write(fr, res, k):
    for v in res:
        u = v * 2 if v >= 0 else -v * 2 - 1
        fr.write_unary(u >> k)
        if k:
            fr.write(u & ((1 << k) - 1), k)


def test_flac_decoder_only_paths_from_spec_bitstreams():
    """FIXED order 4 + rice2 + 2 partitions, LPC order 2, wasted-bits
    CONSTANT, and an escape partition — none of which the encoder
    emits — must decode to independently computed samples."""
    from sqlserver_pg_cdc_spark.operators.multimodal import decode_flac

    # FIXED order 4, two partitions, 5-bit rice2 params
    nb = 16
    x = [(i * i * 3 - 40 * i + 7) % 2000 - 1000 for i in range(nb)]
    res = [x[i] - (4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4]) for i in range(4, nb)]

    def sub1(fr):
        fr.write(0b0001100, 7); fr.write(0, 1)
        for v in x[:4]:
            fr.write(v & 0xFFFF, 16)
        fr.write(0b01, 2); fr.write(1, 4)
        fr.write(6, 5); _rice_write(fr, res[:4], 6)
        fr.write(7, 5); _rice_write(fr, res[4:], 7)

    d = decode_flac(_build_flac_stream(nb, sub1, x))
    assert d is not None and list(d[1]) == x

    # LPC order 2: x[i] = res[i] + ((3*x[i-1] - 2*x[i-2]) >> 1)
    warm, coefs, shift, prec = [100, -200], [3, -2], 1, 4
    resid = [5, -7, 11, 0, -3, 8]
    xs = list(warm)
    for rr in resid:
        xs.append(rr + ((coefs[0] * xs[-1] + coefs[1] * xs[-2]) >> shift))

    def sub2(fr):
        fr.write(0b0100001, 7); fr.write(0, 1)
        for v in warm:
            fr.write(v & 0xFFFF, 16)
        fr.write(prec - 1, 4); fr.write(shift, 5)
        for c in coefs:
            fr.write(c & ((1 << prec) - 1), prec)
        fr.write(0b00, 2); fr.write(0, 4)
        fr.write(3, 4); _rice_write(fr, resid, 3)

    d = decode_flac(_build_flac_stream(len(xs), sub2, xs))
    assert d is not None and list(d[1]) == xs

    # wasted bits: CONSTANT at bps 15 with 1 wasted bit -> value << 1
    def sub3(fr):
        fr.write(0b0000000, 7); fr.write(1, 1); fr.write(1, 1)
        fr.write(21 & 0x7FFF, 15)

    d = decode_flac(_build_flac_stream(10, sub3, [42] * 10))
    assert d is not None and list(d[1]) == [42] * 10

    # escape partition: verbatim 12-bit residuals inside FIXED order 1
    res4 = [1000, -2000, 1500, -1800]
    x4 = [7]
    for rr in res4:
        x4.append(x4[-1] + rr)

    def sub4(fr):
        fr.write(0b0001001, 7); fr.write(0, 1)
        fr.write(x4[0] & 0xFFFF, 16)
        fr.write(0b00, 2); fr.write(0, 4)
        fr.write(0b1111, 4); fr.write(12, 5)
        for v in res4:
            fr.write(v & 0xFFF, 12)

    d = decode_flac(_build_flac_stream(len(x4), sub4, x4))
    assert d is not None and list(d[1]) == x4


def test_flac_corruption_returns_none():
    """Truncation (any split), destroyed magic, a mid-stream bit flip
    (CRC-16), and a frame-header flip (CRC-8) all NULL out — plus the
    catalog's corrupt classes on the contract signal shape."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )
    from sqlserver_pg_cdc_spark.workload import _mm_corrupt

    x = ((np.arange(1600) * 17 + 31) % 2048 - 1024).astype(np.int16)
    p = encode_flac(1000, x, block_size=1024)
    assert decode_flac(p[: len(p) * 3 // 5]) is None
    assert decode_flac(b"\x00\x00" + p) is None
    for cut in (10, 41, 43, len(p) // 2, len(p) - 1):
        assert decode_flac(p[:cut]) is None, cut
    bad = bytearray(p); bad[len(p) // 2] ^= 0x40
    assert decode_flac(bytes(bad)) is None
    # contract corruption classes over a stride of the query combo space
    for k in range(0, 8192, 37):
        off, n = (k * 31) % 2048, 400 * (1 + k % 4)
        j = np.arange(n, dtype=np.int64)
        sig = ((off + j * 17) % 2048 - 1024).astype(np.int16)
        q = encode_flac(1000, sig, block_size=1024)
        assert decode_flac(_mm_corrupt(q, 5)) is None, k
        assert decode_flac(_mm_corrupt(q, 9)) is None, k
        assert decode_flac(_mm_corrupt(q, 0)) is not None, k


def test_flac_escape_partition_encoder_path():
    """The escape-partition branch is part of the cost model: uniform
    wide residuals (Rice's worst case) must select it, its raw width
    must come from the residual RANGE (FIXED order-1/2 of int16 can need
    up to 18 bits — never assume 16), and the stream must round-trip."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _signed_bit_width,
        decode_flac,
        encode_flac,
    )

    # width derivation: signed two's-complement bounds, both signs
    assert _signed_bit_width(np.array([0])) == 1
    assert _signed_bit_width(np.array([-1])) == 1
    assert _signed_bit_width(np.array([1])) == 2
    assert _signed_bit_width(np.array([-2, 1])) == 2
    assert _signed_bit_width(np.array([-65536, 65535])) == 17
    assert _signed_bit_width(np.array([131071])) == 18

    # pseudo-uniform 10-bit samples: order-0 residuals are uniform, so
    # best-k Rice costs ~w+1.5 bits/value while escape costs w — the
    # cost model must pick escape and still decode losslessly
    x = (((np.arange(4000) * 2654435761) % 1024) - 512).astype(np.int16)
    enc = encode_flac(8000, x, block_size=1024)
    d = decode_flac(enc)
    assert d is not None and d[0] == 8000 and np.array_equal(d[1], x)
    # escape ~= 10 bits/sample (plus headers); best-k rice needs ~11.5 —
    # the encoded size itself witnesses the escape branch was taken
    assert len(enc) < 4000 * 11 / 8

    # order-1/2 residuals beyond 16 bits through the escape/rice path:
    # alternating extremes produce |res| up to 65535 (17-bit signed)
    y = np.array([-32768, 32767] * 2000, dtype=np.int16)
    dy = decode_flac(encode_flac(8000, y, block_size=512))
    assert dy is not None and np.array_equal(dy[1], y)


def test_resize_jpeg_grid_on_arbitrary_content(spark):
    """JPEG resize must apply the exact floor(i*src/dst) index map to
    the DECODED pixels and re-encode deterministically — pinned on
    non-constant content (the oracle contract rides solid gray; this
    covers the grid)."""
    import numpy as np
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _jpeg_pixels,
        encode_jpeg,
        resize_images,
    )

    w, h = 24, 16
    px = bytes(((x * 7 + y * 13 + c) * 11) % 256
               for y in range(h) for x in range(w) for c in range(3))
    payload = encode_jpeg(w, h, px, channels=3)
    df = spark.createDataFrame([(1, payload), (2, b"junk"), (3, None)],
                               "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in
           resize_images(df, "doc_id", "payload", 7, 5, codec="jpeg").collect()}
    # corrupt / NULL inputs -> NULL payload
    assert out[2]["payload"] is None and out[3]["payload"] is None
    # expected: decode -> index-map sample -> deterministic re-encode
    dec = _jpeg_pixels(payload)
    ys = (np.arange(5) * dec.shape[0]) // 5
    xs = (np.arange(7) * dec.shape[1]) // 7
    want = encode_jpeg(7, 5, dec[np.ix_(ys, xs)].tobytes(), channels=3)
    assert bytes(out[1]["payload"]) == want
    # and the resized payload itself decodes
    assert _jpeg_pixels(bytes(out[1]["payload"])).shape == (5, 7, 3)


def test_resize_strict_codec_raises(spark):
    from sqlserver_pg_cdc_spark.operators.multimodal import resize_images

    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    out = resize_images(df, "doc_id", "payload", 4, 4, codec="strict")
    import pytest as _pytest

    with _pytest.raises(Exception, match="image library"):
        out.collect()


def test_avi_container_roundtrip_and_demux():
    """Spec-correct AVI wrap + RIFF chunk-walk demux: every frame comes
    back byte-identical; truncation kills exactly the trailing frame(s)
    (lenient prefix demux); non-AVI payloads demux to nothing."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_jpeg,
        encode_avi_mjpeg,
        encode_jpeg,
        split_avi_mjpeg,
    )

    frames = [
        encode_jpeg(16, 8, bytes([2 * g]) * (16 * 8 * 3), channels=3)
        for g in (10, 60, 110, 3)
    ]
    avi = encode_avi_mjpeg(frames, 16, 8, fps=25)
    # RIFF structure sanity: magic, declared size covers the payload
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert 8 + int.from_bytes(avi[4:8], "little") == len(avi)
    spans = split_avi_mjpeg(avi)
    assert [avi[s:e] for s, e in spans] == frames
    for s, e in spans:
        assert decode_jpeg(avi[s:e]) is not None
    # tail chop: exactly the last frame drops
    assert len(split_avi_mjpeg(avi[:-2])) == 3
    # cut inside frame 3: frames 1-2 survive
    assert len(split_avi_mjpeg(avi[: spans[2][0] + 4])) == 2
    # corrupt magic / junk / empty
    assert split_avi_mjpeg(b"XXXX" + avi[4:]) == []
    assert split_avi_mjpeg(b"RIFFxxxxWAVE") == []
    assert split_avi_mjpeg(b"") == [] and split_avi_mjpeg(None) == []
    # empty movie: header-only AVI demuxes to no frames, no crash
    assert split_avi_mjpeg(encode_avi_mjpeg([], 16, 8)) == []


def test_avi_sample_video_frames_matches_elementary_stream(spark):
    """decoder='avi' must produce exactly the rows decoder='mjpeg'
    produces for the same frames — the container is value-transparent."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mjpeg,
        sample_video_frames,
    )

    frames = [
        encode_jpeg(16, 8, bytes([2 * g]) * (16 * 8 * 3), channels=3)
        for g in (5, 50, 100, 20, 80)
    ]
    df_avi = spark.createDataFrame(
        [(1, encode_avi_mjpeg(frames, 16, 8))], "doc_id long, payload binary"
    )
    df_raw = spark.createDataFrame(
        [(1, encode_mjpeg(frames))], "doc_id long, payload binary"
    )
    kw = dict(fps=25, stride=2, max_frames=8)
    got_avi = sorted(
        tuple(r) for r in
        sample_video_frames(df_avi, "doc_id", "payload", decoder="avi", **kw).collect()
    )
    got_raw = sorted(
        tuple(r) for r in
        sample_video_frames(df_raw, "doc_id", "payload", decoder="mjpeg", **kw).collect()
    )
    assert got_avi == got_raw and len(got_avi) == 3  # frames 0, 2, 4


def test_resize_images_png_lossless_grid(spark):
    """PNG resize: inflate+unfilter -> index-map sample -> refilter+
    deflate. Lossless, so resized pixels ARE the sampled originals —
    RGB and RGBA, with corrupt inputs passing through as NULL."""
    import numpy as np
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _png_pixels,
        encode_png,
        resize_images,
    )

    rng = np.random.default_rng(8)
    rows = []
    srcs = {}
    for doc_id, ch in ((0, 3), (1, 4), (2, 3)):
        px = rng.integers(0, 255, (11, 13, ch), dtype=np.uint8)
        p = encode_png(13, 11, px.tobytes(), channels=ch)
        if doc_id == 2:
            p = p[: len(p) * 3 // 5]
        srcs[doc_id] = px
        rows.append((doc_id, p))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in resize_images(
            df, "doc_id", "payload", width=5, height=4, codec="png"
        ).collect()
    }
    assert out[2]["payload"] is None  # corrupt -> NULL through
    for doc_id in (0, 1):
        px = srcs[doc_id]
        got = _png_pixels(bytes(out[doc_id]["payload"]))
        ys = (np.arange(4) * 11) // 4
        xs = (np.arange(5) * 13) // 5
        assert np.array_equal(got, px[np.ix_(ys, xs)])


def test_resize_images_gif_index_space(spark):
    """GIF resize samples in palette-index space: the resized frame's
    indices ARE the sampled originals, the color table is preserved
    verbatim, and interlaced sources de-permute to natural order
    first."""
    import numpy as np
    import pandas as pd

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _gif_frame,
        encode_gif,
        resize_images,
    )

    rng = np.random.default_rng(12)
    pal = [
        (int(rng.integers(256)), int(rng.integers(256)), int(rng.integers(256)))
        for _ in range(8)
    ]
    idx = rng.integers(0, 8, (9, 14), dtype=np.uint8)
    p = encode_gif(14, 9, pal, idx.reshape(-1).tobytes())
    rows = [(0, p), (1, p[: len(p) * 3 // 5])]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in resize_images(
            df, "doc_id", "payload", width=5, height=4, codec="gif"
        ).collect()
    }
    assert out[1]["payload"] is None
    i2, rgb = _gif_frame(bytes(out[0]["payload"]))
    ys = (np.arange(4) * 9) // 4
    xs = (np.arange(5) * 14) // 5
    assert np.array_equal(i2, idx[np.ix_(ys, xs)])
    assert np.array_equal(rgb[:8], np.array(pal, dtype=np.uint8))
