"""Property-based tests (Hypothesis), porting the reference's invariant
suite (tests/property/test_reconciliation_properties.py):

- row-count comparison invariants (:33)
- checksum determinism (:86), input-uniqueness (:110), order-independence
  (our A3 default is order-INsensitive by design — the reference property
  at :366 asserts order-dependence of its serial fold; we assert both
  sides of that contract on the respective modes), avalanche (:404)
- masking invariants (malformed emails BUG-4, Luhn, null passthrough)
- incremental-state machine (:266-331) — simplified transition property

Strategy note: one shared local SparkSession; Hypothesis drives the data,
Spark executes — examples kept small (dev profile ~20) so the suite stays
fast. The canonicalization layer is exercised with arbitrary text
including '|' separators and unicode.
"""

import hashlib
import re

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from sqlserver_pg_cdc_spark.operators.checksum import table_checksum
from sqlserver_pg_cdc_spark.operators.counts import compare_counts
from sqlserver_pg_cdc_spark.operators.report import calculate_severity
from sqlserver_pg_cdc_spark.state import IncrementalStateTracker

SET = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**9), texts | st.none()),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


def _df(spark, data):
    return spark.createDataFrame(data, "id long, v string") if data else \
        spark.createDataFrame([], "id long, v string")


# --- counts ---------------------------------------------------------------

@given(s=st.integers(0, 10**12), t=st.integers(0, 10**12))
@SET
def test_count_comparison_invariants(s, t):
    c = compare_counts(s, t)
    assert c.difference == t - s
    assert c.match == (s == t)
    assert c.status in ("MATCH", "MISMATCH")
    assert compare_counts(t, s).difference == -c.difference


@given(s=st.integers(0, 10**9), d=st.integers(0, 10**9))
@SET
def test_severity_monotone(s, d):
    order = ["LOW", "MEDIUM", "HIGH", "CRITICAL"]
    sev = calculate_severity(s, d)
    assert sev in order
    # more difference never lowers severity
    assert order.index(calculate_severity(s, d + max(1, d // 10))) >= order.index(sev)


# --- checksums ------------------------------------------------------------

@given(data=rows)
@SET
def test_checksum_deterministic_and_permutation_invariant(spark, data):
    df = _df(spark, data)
    a = table_checksum(df).collect()[0]
    b = table_checksum(df).collect()[0]
    assert a == b
    rev = _df(spark, list(reversed(data)))
    c = table_checksum(rev).collect()[0]
    assert (a["checksum"], a["row_count"]) == (c["checksum"], c["row_count"])


@given(data=rows.filter(lambda d: len(d) > 0))
@SET
def test_checksum_avalanche_on_single_row_change(spark, data):
    df = _df(spark, data)
    changed = [(i, (v or "") + "x") if idx == 0 else (i, v)
               for idx, (i, v) in enumerate(data)]
    df2 = _df(spark, changed)
    assert (
        table_checksum(df).collect()[0]["checksum"]
        != table_checksum(df2).collect()[0]["checksum"]
    )


@given(data=rows)
@SET
def test_checksum_row_count_matches(spark, data):
    assert table_checksum(_df(spark, data)).collect()[0]["row_count"] == len(data)


# --- masking --------------------------------------------------------------

@given(v=texts)
@SET
def test_mask_email_never_leaks_local_part(spark, v):
    from sqlserver_pg_cdc_spark.functions.masking import mask_email

    df = spark.createDataFrame([(v,)], "v string")
    [out] = [r[0] for r in df.select(mask_email("v")).collect()]
    if "@" in v:
        local = v.split("@", 1)[0]
        domain = v.split("@", 1)[1]
        malformed = not local or not domain or "@" in domain
        if malformed:
            assert out == "*" * len(v)
        elif len(local) > 1:
            # everything after the first char of the local part is masked
            assert out.startswith(local[0] + "*")
            assert local[1:] not in out or local[1:] == ""
    else:
        assert out == v


@given(v=st.text(alphabet="0123456789- ()", min_size=0, max_size=20))
@SET
def test_mask_phone_keeps_only_last4(spark, v):
    from sqlserver_pg_cdc_spark.functions.masking import mask_phone

    df = spark.createDataFrame([(v,)], "v string")
    [out] = [r[0] for r in df.select(mask_phone("v")).collect()]
    digits = re.sub(r"\D", "", v)
    if len(digits) < 4:
        assert out == v
    else:
        out_digits = re.sub(r"[^\d]", "", out)
        assert out_digits == digits[-4:]
        assert len(out) == len(v)  # format preserved


@given(v=texts, salt=st.text(min_size=8, max_size=16, alphabet="abcdef123"))
@SET
def test_hash_value_matches_hashlib_property(spark, v, salt):
    from sqlserver_pg_cdc_spark.functions.masking import hash_value

    df = spark.createDataFrame([(v,)], "v string")
    [out] = [r[0] for r in df.select(hash_value("v", salt)).collect()]
    assert out == hashlib.sha256((salt + v).encode()).hexdigest()


# --- incremental state machine -------------------------------------------

@given(
    runs=st.lists(
        st.tuples(st.sampled_from(["full", "delta"]), st.integers(0, 10**6)),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_state_tracker_last_write_wins(tmp_path_factory, runs):
    tr = IncrementalStateTracker(str(tmp_path_factory.mktemp("state")))
    for i, (mode, count) in enumerate(runs):
        tr.record_run("t", f"sum{i}", count, mode=mode)
    final = tr.load("t")
    assert final.checksum == f"sum{len(runs) - 1}"
    assert final.row_count == runs[-1][1]
    assert final.mode == runs[-1][0]


@given(rows)
@SET
def test_bucketed_ordered_checksum_layout_invariant(spark, data):
    """The hierarchical A2 digest is a pure function of (key order,
    values): any repartitioning yields the identical digest, and the
    flat form equals the serial semantics it derives from."""
    from sqlserver_pg_cdc_spark.operators.checksum import ordered_checksum_df

    df = _df(spark, data)
    a = ordered_checksum_df(df, ["id"], bucket_width=7).collect()[0]
    b = ordered_checksum_df(df.repartition(5), ["id"], bucket_width=7).collect()[0]
    assert a["checksum"] == b["checksum"]
    assert a["row_count"] == len(data)


@given(rows, st.integers(min_value=1, max_value=9))
@SET
def test_weighted_sample_nested_fractions(spark, data, tenths):
    """Monotone thresholds nest the samples: sample(f1) ⊆ sample(f2)
    for f1 <= f2, at any constant weight."""
    from pyspark.sql import functions as F

    from sqlserver_pg_cdc_spark.operators.sampling import weighted_sample

    df = _df(spark, data).withColumn("w", F.lit(0.8))
    f1 = tenths / 10.0
    f2 = min(1.0, f1 + 0.3)
    s1 = {r["id"] for r in weighted_sample(df, "id", "w", f1).collect()}
    s2 = {r["id"] for r in weighted_sample(df, "id", "w", f2).collect()}
    assert s1 <= s2


edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=0, max_size=25,
).map(lambda es: [(a, b) for a, b in es if a != b])


@given(edge_lists)
@SET
def test_dup_components_matches_union_find(spark, edges):
    """Distributed label propagation == classic union-find on random
    graphs; exactly one keep per component and component = min(member)."""
    from sqlserver_pg_cdc_spark.operators.dedup import dup_components

    if not edges:
        return
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["doc"]: (r["component"], r["keep"])
           for r in dup_components(df).collect()}
    assert {n: c for n, (c, _) in got.items()} == want
    for n, (c, keep) in got.items():
        assert keep == (n == c)


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(w, h, data):
    """encode_bmp -> decode_bmp recovers dims and the exact pixel sum for
    any size (odd widths exercise every padding case 1-3)."""
    from sqlserver_pg_cdc_spark.operators.multimodal import decode_bmp, encode_bmp

    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    got = decode_bmp(encode_bmp(w, h, px))
    assert got == (w, h, 3, sum(px), w * h * 3)


@given(
    rate=st.sampled_from([1000, 8000, 16000]),
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=300),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(rate, samples):
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    got = decode_wav_pcm16(encode_wav_pcm16(rate, samples))
    assert got is not None
    assert got[0] == rate and list(got[1]) == samples


@given(
    n_txns=st.integers(1, 4),
    data=st.data(),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_split_transactions_partition_property(spark, n_txns, data):
    """For any assignment of rows to transactions and any subset of END
    markers present, split_transactions partitions the input: every data
    row lands in exactly one of (ready, pending); a transaction's rows
    are ready iff its marker is present AND all its rows arrived."""
    from pyspark.sql import functions as F

    from sqlserver_pg_cdc_spark.streaming.apply import (
        TXN_MARKER_OP,
        split_transactions,
    )

    rows, expected_ready = [], set()
    lsn = 0
    for t in range(n_txns):
        txn = f"T{t}"
        size = data.draw(st.integers(1, 4))
        present = data.draw(st.integers(1, size))  # rows that arrived
        has_marker = data.draw(st.booleans())
        for i in range(present):
            lsn += 1
            rows.append((lsn, txn, None, "c"))
        if has_marker:
            lsn += 1
            rows.append((lsn, txn, size, TXN_MARKER_OP))
        if has_marker and present >= size:
            expected_ready |= {
                r[0] for r in rows if r[1] == txn and r[3] != TXN_MARKER_OP
            }
    # one non-transactional row, always ready
    lsn += 1
    rows.append((lsn, None, None, "c"))
    expected_ready.add(lsn)

    df = spark.createDataFrame(
        rows, "lsn long, __txn_id string, __txn_event_count long, __op string"
    )
    ready, pending, malformed = split_transactions(df)
    got_ready = {r["lsn"] for r in ready.collect()}
    got_pending = {r["lsn"] for r in pending.collect()}
    assert got_ready == expected_ready
    assert got_ready.isdisjoint(got_pending)
    data_lsns = {r[0] for r in rows if r[3] != TXN_MARKER_OP}
    # every data row is in exactly one side
    assert data_lsns == got_ready | (got_pending & data_lsns)


# --- gap fill vs a pure-Python reference ----------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),        # key
            st.integers(min_value=0, max_value=3600 * 8), # offset seconds
            st.integers(min_value=0, max_value=50),       # tiebreak id
            st.floats(min_value=-10, max_value=10, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_gap_fill_matches_python_reference(spark, rows):
    import datetime as dt

    from sqlserver_pg_cdc_spark.operators.temporal import gap_fill

    base = dt.datetime(2024, 3, 1)
    data = [
        (k, base + dt.timedelta(seconds=off), tid, v) for k, off, tid, v in rows
    ]
    df = spark.createDataFrame(
        data, "k long, ts timestamp, tid long, value double"
    )
    got = {
        (r["k"], r["bucket_ts"]): (r["value_filled"], r["is_gap"])
        for r in gap_fill(df, "k", "ts", "value", "tid", "hour").collect()
    }

    # reference: per key, last (ts, tid) observation per hour bucket,
    # spine over [min_bucket, max_bucket], forward fill
    want = {}
    bykey = {}
    for k, ts, tid, v in data:
        bykey.setdefault(k, []).append((ts, tid, v))
    for k, obs in bykey.items():
        bucket_of = lambda t: t.replace(minute=0, second=0, microsecond=0)
        per_bucket = {}
        for ts, tid, v in obs:
            b = bucket_of(ts)
            if b not in per_bucket or (ts, tid) > per_bucket[b][:2]:
                per_bucket[b] = (ts, tid, v)
        bs = sorted(per_bucket)
        cur, b = None, bs[0]
        while b <= bs[-1]:
            if b in per_bucket:
                cur = per_bucket[b][2]
                want[(k, b)] = (cur, False)
            else:
                want[(k, b)] = (cur, True)
            b += dt.timedelta(hours=1)
    assert got == want


# --- LM scoring vs a pure-Python reference --------------------------------


@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=10
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_lm_score_matches_python_reference(spark, texts):
    import math

    from sqlserver_pg_cdc_spark.operators.lm import BACKOFF_ALPHA, lm_score

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in lm_score(df, df, "doc_id", "text").collect()
    }

    def toks(t):
        return [w for w in t.lower().strip().split() if w]

    uni, bi, n_tokens = {}, {}, 0
    for _, t in docs:
        ws = toks(t)
        n_tokens += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    for i, t in docs:
        ws = toks(t)
        grams = list(zip(ws, ws[1:]))
        if not grams:
            assert got[i] == (0, None)
            continue
        s = 0
        for a, b in grams:
            if (a, b) in bi:
                p = bi[(a, b)] / uni[a]
            else:
                p = BACKOFF_ALPHA * (uni.get(b, 0) + 1) / (n_tokens + v)
            s += math.floor(1_000_000 * math.log(p))
        assert got[i][0] == len(grams)
        assert got[i][1] == pytest.approx(s / (len(grams) * 1_000_000), abs=0)


# --- fuzzy join completeness on random strings ----------------------------


@given(
    st.lists(st.text(alphabet="abc", min_size=0, max_size=6), min_size=1, max_size=12),
    st.lists(st.text(alphabet="abc", min_size=0, max_size=6), min_size=1, max_size=12),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_fuzzy_join_complete_on_random_strings(spark, left, right):
    """Deletion-neighborhood blocking must equal brute force at
    Levenshtein <= 1 AND <= 2 on arbitrary short strings (a dense
    distance space — the adversarial case for blocking recall)."""
    from sqlserver_pg_cdc_spark.operators.fuzzy import fuzzy_join_typo

    a = spark.createDataFrame(list(enumerate(left)), "id long, name string")
    b = spark.createDataFrame(list(enumerate(right)), "id long, name string")
    got = {
        (r["a_id"], r["b_id"])
        for r in fuzzy_join_typo(a, b, "id", "id", "name").collect()
    }
    got2 = {
        (r["a_id"], r["b_id"])
        for r in fuzzy_join_typo(a, b, "id", "id", "name", max_dist=2).collect()
    }

    def lev(x, y):
        if len(x) < len(y):
            x, y = y, x
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x):
            cur = [i + 1]
            for j, cy in enumerate(y):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (cx != cy)))
            prev = cur
        return prev[-1]

    want = {
        (i, j)
        for i, x in enumerate(left)
        for j, y in enumerate(right)
        if lev(x, y) <= 1
    }
    assert got == want
    want2 = {
        (i, j)
        for i, x in enumerate(left)
        for j, y in enumerate(right)
        if lev(x, y) <= 2
    }
    assert got2 == want2


# --- incremental diff equals full diff under random perturbation ----------


@given(
    st.sets(st.integers(min_value=0, max_value=60), max_size=8),  # deleted keys
    st.sets(st.integers(min_value=0, max_value=60), max_size=8),  # modified keys
    st.sets(st.integers(min_value=100, max_value=120), max_size=5),  # inserted
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_incremental_diff_equals_full_random(spark, deleted, modified, inserted):
    from sqlserver_pg_cdc_spark.operators.diff import diff_tables, incremental_diff

    src_rows = [(i, f"v{i}") for i in range(60)]
    tgt_rows = [
        (i, f"v{i}" if i not in modified else "CHANGED")
        for i in range(60)
        if i not in deleted
    ] + [(i, "new") for i in inserted]
    src = spark.createDataFrame(src_rows, "id long, s string")
    tgt = spark.createDataFrame(tgt_rows, "id long, s string")
    full = {tuple(r) for r in diff_tables(src, tgt, ["id"]).collect()}
    inc = {
        tuple(r) for r in incremental_diff(src, tgt, ["id"], n_buckets=8).collect()
    }
    assert inc == full


@settings(max_examples=25, deadline=None)
@given(
    bw=st.integers(1, 3),
    bh=st.integers(1, 2),
    crop_x=st.integers(0, 7),
    crop_y=st.integers(0, 7),
    channels=st.sampled_from([1, 3]),
    seed=st.integers(0, 10**9),
)
def test_jpeg_codec_matches_independent_reference(
    bw, bh, crop_x, crop_y, channels, seed
):
    """decode(encode(x)) must equal an independently-computed reference
    of the same math (YCbCr -> pad -> DCT -> quantize -> dequantize ->
    IDCT -> color back -> clamp) for ARBITRARY images — the Huffman /
    zigzag / bitstream layers are lossless around the quantizer."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _IDCT_M,
        _JPEG_QTABLE,
        _JPEG_ZIGZAG,
        decode_jpeg,
        encode_jpeg,
    )

    w = bw * 8 - crop_x
    h = bh * 8 - crop_y
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(w, h, arr.tobytes(), channels=channels))
    assert got is not None
    # ---- independent reference ----
    if channels == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]
    q = np.array(_JPEG_QTABLE, dtype=np.float64)[
        np.argsort(_JPEG_ZIGZAG)
    ].reshape(8, 8)
    out_planes = []
    for p in planes:
        # edge-replicate to block multiples (the encoder's padding)
        py = np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        rec = np.zeros_like(py)
        for by in range(bh):
            for bx in range(bw):
                blk = py[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                deq = np.round((_IDCT_M @ blk @ _IDCT_M.T) / q) * q
                rec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _IDCT_M.T @ deq @ _IDCT_M + 128.0
                )
        out_planes.append(rec[:h, :w])
    if channels == 3:
        y, cb, cr = out_planes
        rgb = [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ]
    else:
        rgb = out_planes
    want = sum(
        int(np.clip(np.round(p), 0, 255).astype(np.int64).sum()) for p in rgb
    )
    assert got == (w, h, channels, want, w * h * channels)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(2, 1500),
    amp=st.integers(0, 30000),
    period=st.floats(3.0, 200.0),
    seed=st.integers(0, 10**9),
)
def test_adpcm_roundtrip_properties(n, amp, period, seed):
    """Any signal: decode(encode(x)) preserves the sample count and
    rate, never exceeds int16 range, and tracks the signal within the
    quantizer's step-bounded error envelope (checked as SNR > 10 dB for
    band-limited content, plus exact first-sample seeding per block)."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    rng = np.random.default_rng(seed)
    smooth = amp * np.sin(np.arange(n) / period)
    noise = rng.normal(0, amp * 0.02 + 1, n)
    sig = np.clip(smooth + noise, -32768, 32767).astype(np.int16)
    rate = 8000
    r = decode_wav_adpcm(encode_wav_adpcm(rate, sig))
    assert r is not None
    got_rate, out = r
    assert got_rate == rate and len(out) == n
    # block seeds are carried verbatim
    assert out[0] == sig[0]
    # SNR bound only where ADPCM can physically track: enough samples
    # for step adaptation and a max slope (amp/period per sample) the
    # adaptive quantizer can follow — slope-overloaded signals degrade
    # by design, like any delta modulator
    if amp >= 100 and n >= 200 and amp / period <= 3000:
        err = out.astype(np.int64) - sig.astype(np.int64)
        snr = 10 * np.log10(
            max(1, (sig.astype(np.int64) ** 2).mean())
            / max(1, (err ** 2).mean())
        )
        assert snr > 10, snr


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    ncolors=st.integers(1, 256),
    seed=st.integers(0, 10**9),
)
# r9 regression pin: this stream's final data emit left the LZW table at
# exactly 2^width, so a conforming decoder widens before reading EOI —
# the encoder now mirrors that (multimodal.py encode_gif final flush)
@example(w=3, h=5, ncolors=3, seed=0)
def test_gif_roundtrip_exact_properties(w, h, ncolors, seed):
    """GIF is lossless: decode(encode(x)) returns the EXACT dims and
    palette-mapped pixel sum for arbitrary palettes and index streams."""
    import random

    from sqlserver_pg_cdc_spark.operators.multimodal import decode_gif, encode_gif

    rnd = random.Random(seed)
    palette = [
        (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
        for _ in range(ncolors)
    ]
    idx = bytes(rnd.randrange(ncolors) for _ in range(w * h))
    want = sum(sum(palette[i]) for i in idx)
    assert decode_gif(encode_gif(w, h, palette, idx)) == (w, h, 3, want, w * h * 3)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(0, 3000),
    kind=st.integers(0, 3),
    amp=st.integers(0, 32767),
    period=st.floats(2.0, 300.0),
    block=st.sampled_from([192, 576, 1024, 4096]),
    seed=st.integers(0, 10**9),
)
def test_flac_roundtrip_is_exactly_lossless(n, kind, amp, period, block, seed):
    """FLAC is LOSSLESS: decode(encode(x)) == x EXACTLY for every
    signal family (constant, ramp, sine, white noise), every block
    size, every length — including the short-final-block and
    empty-stream edges. Rate and sample count are preserved and the
    STREAMINFO MD5 self-validates on the way back out."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.default_rng(seed)
    if kind == 0:
        sig = np.full(n, ((seed % 65536) - 32768), dtype=np.int16)
    elif kind == 1:
        sig = (np.arange(n) * (1 + seed % 7) % 65536 - 32768).astype(np.int16)
    elif kind == 2:
        sig = np.clip(amp * np.sin(np.arange(n) / period), -32768, 32767).astype(np.int16)
    else:
        sig = rng.integers(-32768, 32768, n).astype(np.int16)
    r = decode_flac(encode_flac(8000, sig, block_size=block))
    assert r is not None
    rate, out = r
    assert rate == 8000 and np.array_equal(out, sig)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10**6), k=st.integers(3, 6), n_docs=st.integers(2, 8))
def test_duplicate_spans_invariants(spark, seed, k, n_docs):
    """Any corpus: spans are disjoint per doc, at least k tokens long,
    inside the doc's token range; every flagged window really does
    recur in >= 2 distinct docs; and the strip step removes exactly
    the spanned token count."""
    import random

    from sqlserver_pg_cdc_spark.operators.corpus import (
        duplicate_spans,
        strip_duplicate_spans,
    )

    from pyspark.sql import functions as F

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(12)]  # small vocab -> real collisions
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = duplicate_spans(df, "doc_id", "text", k=k, min_docs=2).collect()
    toks = {i: t.split() for i, t in docs}
    per_doc: dict = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_windows"])
        )
    win_sets: dict = {}
    for i, tk in toks.items():
        win_sets[i] = {
            " ".join(tk[j : j + k]) for j in range(len(tk) - k + 1)
        }
    for doc_id, sp in per_doc.items():
        sp.sort()
        tk = toks[doc_id]
        prev_end = -1
        for start, end, nwin in sp:
            assert 0 <= start < end <= len(tk)
            assert end - start >= k
            assert start > prev_end  # disjoint maximal spans
            prev_end = end
            # the first window of the span must recur in another doc
            w = " ".join(tk[start : start + k])
            assert any(w in win_sets[o] for o in win_sets if o != doc_id)
    stripped = strip_duplicate_spans(
        df, spark.createDataFrame(
            [(r["doc_id"], r["span_start"], r["span_end"]) for r in spans]
            or [(None, None, None)],
            "doc_id long, span_start long, span_end long",
        ).filter(F.col("doc_id").isNotNull()),
        "doc_id", "text",
    ).collect()
    spanned = {
        d: sum(e - s for s, e, _ in sp) for d, sp in per_doc.items()
    }
    for r in stripped:
        assert r["n_removed"] == spanned.get(r["doc_id"], 0)
        assert r["n_tokens"] == len(toks[r["doc_id"]])


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(2, 12),
    rows=st.integers(0, 400),
    dup_every=st.integers(0, 5),
    seed=st.integers(0, 10**6),
)
def test_quantile_buckets_invariants(spark, n, rows, dup_every, seed):
    """Any data, any n: buckets are in [1, n], monotone in the value
    (sorting by value never decreases the bucket), equal values share a
    bucket, NULLs get NULL, and non-null rows are all assigned."""
    import random

    from pyspark.sql import functions as F

    from sqlserver_pg_cdc_spark.operators.quality import quantile_buckets

    rng = random.Random(seed)
    data = []
    for i in range(rows):
        if i % 7 == 3:
            data.append((i, None))
        elif dup_every and i % (dup_every + 1) == 0:
            data.append((i, 42.0))  # heavy ties
        else:
            data.append((i, rng.uniform(-1e6, 1e6)))
    df = spark.createDataFrame(data or [(0, None)], "id long, v double")
    got = quantile_buckets(df, "v", n).collect()
    by_val = sorted((r for r in got if r["v"] is not None), key=lambda r: r["v"])
    prev_bucket = 0
    val_bucket = {}
    for r in by_val:
        b = r["bucket"]
        assert b is not None and 1 <= b <= n
        assert b >= prev_bucket  # monotone in the value
        prev_bucket = b
        if r["v"] in val_bucket:
            assert val_bucket[r["v"]] == b  # ties stay together
        val_bucket[r["v"]] = b
    for r in got:
        assert (r["v"] is None) == (r["bucket"] is None)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_keys=st.integers(1, 6),
    n_events=st.integers(1, 40),
    n_batches=st.integers(1, 4),
    seed=st.integers(0, 10**6),
)
def test_scd2_apply_invariants(spark, n_keys, n_events, n_batches, seed):
    """Any CDC event sequence, any batch split: the SCD2 history holds
    exactly one row per (key, LSN); per key the validity intervals chain
    contiguously from the first LSN to the OPEN sentinel; at most one
    active version per key, active iff the latest op isn't a delete;
    and as_of at any LSN equals the relational latest-at-LSN recompute.
    Batch-split independence: ANY split produces the identical history."""
    import random

    from pyspark.sql import functions as F

    from sqlserver_pg_cdc_spark.streaming.scd2 import (
        OPEN_LSN,
        as_of_lsn,
        scd2_apply,
    )

    rng = random.Random(seed)
    events = []
    for lsn in range(1, n_events + 1):
        k = rng.randrange(n_keys)
        op = rng.choice(["c", "u", "u", "d"])
        events.append((k, f"v{lsn}" if op != "d" else None, lsn, op))
    schema = "id long, name string, lsn long, op string"

    # random batch split (contiguous by LSN, like a real change stream)
    cuts = sorted(rng.sample(range(1, n_events), min(n_batches - 1, n_events - 1))) if n_events > 1 else []
    bounds = [0] + cuts + [n_events]
    hist = None
    for i in range(len(bounds) - 1):
        batch = events[bounds[i]:bounds[i + 1]]
        if not batch:
            continue
        hist = scd2_apply(hist, spark.createDataFrame(batch, schema), ["id"])
    rows = hist.collect()

    # one row per (key, LSN), every event present
    assert len(rows) == n_events
    assert {(r["id"], r["__lsn"]) for r in rows} == {(k, l) for k, _, l, _ in events}

    per_key: dict = {}
    for r in rows:
        per_key.setdefault(r["id"], []).append(r)
    latest = {}
    for k, name, lsn, op in events:
        latest[k] = (lsn, op)
    for k, versions in per_key.items():
        versions.sort(key=lambda r: r["__lsn"])
        # contiguous chain: each closes at the next's LSN, last is OPEN
        for a, b in zip(versions, versions[1:]):
            assert a["__valid_to_lsn"] == b["__lsn"]
        assert versions[-1]["__valid_to_lsn"] == OPEN_LSN
        actives = [r for r in versions if r["__active"]]
        if latest[k][1] == "d":
            assert actives == []
        else:
            assert len(actives) == 1 and actives[0]["__lsn"] == latest[k][0]

    # time travel == relational recompute at a few probe LSNs
    for probe in {1, n_events // 2, n_events}:
        got = {(r["id"], r["name"]) for r in as_of_lsn(hist, probe).collect()}
        want = {}
        for k, name, lsn, op in events:
            if lsn <= probe:
                want[k] = (name, op)
        want_set = {(k, v[0]) for k, v in want.items() if v[1] != "d"}
        assert got == want_set, (probe, got, want_set)

    # batch-split independence: one-shot apply gives the identical history
    one = scd2_apply(None, spark.createDataFrame(events, schema), ["id"])
    assert {tuple(r) for r in one.collect()} == {tuple(r) for r in rows}


# --- day-2 maintenance invariants -------------------------------------------

maint_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),            # id
        st.integers(min_value=1, max_value=20),           # lsn
        st.booleans(),                                    # deleted?
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(changes=maint_changes, wm=st.integers(min_value=0, max_value=21))
def test_purge_preserves_live_view_and_guarded_tombstones(
    spark, tmp_path, changes, wm
):
    """For ANY batch of keyed changes and ANY watermark: the live view
    is untouched, tombstones at/below the watermark vanish, tombstones
    above it stay, and a second purge is a no-op."""
    import uuid as _uuid

    from sqlserver_pg_cdc_spark.streaming.apply import (
        PartitionedParquetUpsertSink,
    )

    sink = PartitionedParquetUpsertSink(
        spark, str(tmp_path / f"st_{_uuid.uuid4().hex[:8]}"), ["id"],
        n_partitions=4,
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}_{l}", "true" if d else "false", l)
             for i, l, d in changes],
            "id long, name string, __deleted string, lsn long",
        ),
        0,
    )
    # expected state: latest lsn per id
    latest = {}
    for i, l, d in changes:
        if i not in latest or l > latest[i][0]:
            latest[i] = (l, d)
    res = sink.purge_tombstones(wm)
    expect_purged = sum(1 for l, d in latest.values() if d and l <= wm)
    assert res["purged"] == expect_purged
    # Post-full-purge contract (purge_tombstones docstring): a state
    # that was 100% past-horizon tombstones ends with zero part_* dirs
    # and read_target() returns None — same as never-written.
    after = sink.read_target()
    if after is None:
        assert expect_purged == len(latest)
        st_rows = {}
    else:
        st_rows = {r["id"]: (r["lsn"], r["__deleted"])
                   for r in after.collect()}
    for i, (l, d) in latest.items():
        if d and l <= wm:
            assert i not in st_rows          # past-horizon tombstone gone
        elif d:
            assert st_rows[i] == (l, "true")  # guarded tombstone stays
        else:
            assert st_rows[i] == (l, "false")  # live row untouched
    assert sink.purge_tombstones(wm)["purged"] == 0  # idempotent


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(changes=maint_changes, n_new=st.integers(min_value=1, max_value=16))
def test_rescale_preserves_state_and_lookup(spark, tmp_path, changes, n_new):
    """For ANY state and ANY new partition count: the row multiset is
    identical after the re-hash and point lookups still find every key."""
    import uuid as _uuid

    from sqlserver_pg_cdc_spark.streaming.apply import (
        PartitionedParquetUpsertSink,
    )

    sink = PartitionedParquetUpsertSink(
        spark, str(tmp_path / f"st_{_uuid.uuid4().hex[:8]}"), ["id"],
        n_partitions=3,
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}_{l}", l) for i, l, _ in changes],
            "id long, name string, lsn long",
        ),
        0,
    )
    before = sorted(map(tuple, sink.read_target().collect()))
    sink.rescale(n_new)
    assert sorted(map(tuple, sink.read_target().collect())) == before
    ids = sorted({i for i, _, _ in changes})
    got = sink.read_keys(ids)
    assert sorted(r["id"] for r in got.collect()) == ids


scd2_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),            # id
        st.integers(min_value=1, max_value=20),           # lsn
        st.sampled_from(["c", "u", "d"]),                 # op
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(changes=scd2_changes, wm=st.integers(min_value=0, max_value=21))
def test_scd2_prune_time_travel_invariant(spark, tmp_path, changes, wm):
    """For ANY version history and ANY watermark: every time travel at
    or above the watermark returns exactly what it returned before the
    prune, and the prune is idempotent."""
    import uuid as _uuid

    from sqlserver_pg_cdc_spark.streaming.scd2 import PartitionedScd2Sink

    sink = PartitionedScd2Sink(
        spark, str(tmp_path / f"h_{_uuid.uuid4().hex[:8]}"), ["id"],
        n_partitions=3,
    )
    sink(
        spark.createDataFrame(
            [(i, f"v{i}_{l}", l, op) for i, l, op in changes],
            "id long, name string, lsn long, op string",
        ),
        0,
    )
    probes = sorted({wm, wm + 1, 20} | {l for _, l, _ in changes if l >= wm})

    def snap(l):
        return sorted(
            (r["id"], r["name"]) for r in sink.as_of(l).collect()
        )

    before = {l: snap(l) for l in probes}
    sink.prune_history(wm)
    for l in probes:
        assert snap(l) == before[l], l
    assert sink.prune_history(wm)["pruned"] == 0  # idempotent


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 5000),
    kind=st.integers(0, 3),
    amp=st.integers(0, 32767),
    period=st.floats(4.0, 500.0),
    kbps=st.sampled_from([64, 128, 192, 320]),
    rate=st.sampled_from([1000, 8000, 48000]),
    seed=st.integers(0, 10**9),
)
def test_subband_roundtrip_invariants(n, kind, amp, period, kbps, rate, seed):
    """The subband codec is LOSSY, so the property is structural, not
    bit-exact: decode(encode(x)) always succeeds, preserves rate and
    sample count, and at the near-lossless budget the error stays
    inside the quantizer bound for every signal family (constant,
    ramp, sine, white noise), every length — including the empty and
    sub-frame edges."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_subband,
        encode_subband,
    )

    rng = np.random.default_rng(seed)
    if kind == 0:
        sig = np.full(n, ((seed % 65536) - 32768), dtype=np.int16)
    elif kind == 1:
        sig = (np.arange(n) * (1 + seed % 7) % 65536 - 32768).astype(np.int16)
    elif kind == 2:
        sig = np.clip(
            amp * np.sin(np.arange(n) / period), -32768, 32767
        ).astype(np.int16)
    else:
        sig = rng.integers(-32768, 32768, n).astype(np.int16)
    r = decode_subband(encode_subband(rate, sig, kbps=kbps))
    assert r is not None
    got_rate, out = r
    assert got_rate == rate and len(out) == n
    if n and kbps == 320 and rate == 1000:
        # 320 kbps at 1 kHz saturates every quantizer to 16 bits:
        # error bounded by the scalefactor lattice step, far under
        # 1% of full scale even on white noise
        err = np.abs(out.astype(np.int64) - sig.astype(np.int64)).max()
        assert err <= 330, err


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=400), seed=st.integers(0, 10**6))
def test_codec_decoders_never_raise_on_arbitrary_bytes(data, seed):
    """Fuzz the strict-validation contract: arbitrary byte strings —
    including ones that START with each codec's real magic — must
    come back as None or a well-formed result, never an exception.
    At corpus scale every decoder sees adversarial payloads."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _MCV_MAGIC,
        _SB_MAGIC,
        decode_mcv,
        decode_subband,
    )

    for payload in (data, _SB_MAGIC + data, _MCV_MAGIC + data):
        r = decode_subband(payload)
        assert r is None or len(r) == 2
        v = decode_mcv(payload)
        assert v is None or len(v) == 4


@settings(max_examples=12, deadline=None)
@given(
    w_mb=st.integers(1, 3),
    h_mb=st.integers(1, 3),
    n_frames=st.integers(1, 6),
    gop=st.integers(1, 6),
    qscale=st.sampled_from([2, 4, 8]),
    seed=st.integers(0, 10**9),
)
def test_mcv_roundtrip_invariants(w_mb, h_mb, n_frames, gop, qscale, seed):
    """Any gray clip, any GOP structure, any quantizer: the decode
    succeeds, preserves geometry and frame count, and reconstruction
    error stays bounded by the quantizer scale (closed-loop prediction
    means the bound holds for EVERY frame, not just the first GOP)."""
    import numpy as np

    from sqlserver_pg_cdc_spark.operators.multimodal import (
        decode_mcv,
        encode_mcv,
    )

    rng = np.random.default_rng(seed)
    h, w = 16 * h_mb, 16 * w_mb
    frames = []
    base = rng.integers(0, 255, (h, w), dtype=np.uint8)
    for f in range(n_frames):
        g = np.roll(base, 2 * f, axis=1)  # gentle motion
        frames.append(np.stack([g, g, g], axis=2))
    got = decode_mcv(encode_mcv(frames, fps=10, gop=gop, qscale=qscale))
    assert got is not None
    gw, gh, gfps, out = got
    assert (gw, gh, gfps, len(out)) == (w, h, 10, n_frames)
    for a, b in zip(frames, out):
        err = np.abs(a.astype(np.int64) - b.astype(np.int64)).max()
        assert err <= 4 * qscale + 8, err
