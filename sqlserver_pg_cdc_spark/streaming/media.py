"""Streaming-maintained MEDIA fingerprint index + ingest dedup gate:
the multimodal twin of the text gate (`streaming/minhash.DedupGateSink`)
and the embedding gate (`streaming/ann.AnnGateSink`).

A media corpus ingested via CDC used to deduplicate only in a later
batch pass (`operators/multimodal.phash_images` / `audio_fingerprints`
+ grouping); here the cross-container fingerprint index ITSELF is the
streamed state. Each micro-batch:

1. decodes payloads ONCE (one Arrow mapInPandas pass — pHash for
   images, acoustic fingerprint for audio; lsn/delete flags ride
   through as keep_cols, no batch-sized join back),
2. probes the standing index by banded Hamming join (7 bands x 9 bits
   over the 63-bit fingerprint: the SimHash pigeonhole — full recall
   through Hamming <= 6 with NO all-pairs; exact bit_count verify on
   candidates only, both fingerprints already in the band frame so
   verification never refetches state),
3. clusters the remainder within the batch (same banding + connected
   components) and keeps each cluster's canonical (minimum id),
4. upserts survivors into the hash-partitioned LSN-guarded state —
   the corpus the NEXT batch probes.

Rejected docs land in a per-batch-id dup-log generation
(``dups_dir/batch_<id>/``, overwrite — exactly-once under Structured
Streaming replay without read-side dedup), with
`streaming/batchlog.compact_batch_log` retention, exactly like the
text gate's log.

Undecodable payloads (NULL fingerprint) can never collide: they pass
the gate un-gated but still own a state row, so a later payload update
or CDC delete lands on them. CDC deletes bypass the gate entirely — a
delete must reach the index even though its doc has no payload.

Per-batch work is proportional to batch + collisions, never corpus x
batch: the probe joins the batch's 7 band rows per doc against the
banded index, and only Hamming-verified candidates survive. That is
the 100 TB ingest shape.

Reference analog: the reference achieves ingest-time idempotence by
key at the sink (docker/configs/kafka-connect/postgresql-sink.json:
23-31, upsert on PK); here the "key" is perceptual identity — a WAV
and its FLAC re-encode, or a PNG and BMP of one crawl image, collapse
at ingest the way byte-identical keys collapse there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.streaming.apply import PartitionedParquetUpsertSink
from sqlserver_pg_cdc_spark.streaming.gate import GatedIndexMixin

_MEDIA_FP_FNS = ("image", "audio", "video", "auto")

# Every Hamming band join is FAMILY-SCOPED: a pHash and an acoustic
# fingerprint at small Hamming distance mean nothing, so `family` is a
# join key wherever band_val is — cross-family candidates are
# impossible by construction, not by filtering.
_BAND_KEYS = ["family", "band_id", "band_val"]


def _fp_band_frame(fp_df: DataFrame, doc_col: str, fp_col: str) -> DataFrame:
    """(doc, fp, family) -> (doc, fp, family, band_id, band_val): the
    7x9-bit banded Hamming pigeonhole of
    `operators/multimodal.phash_near_pairs`, shared verbatim so gate
    recall == batch-operator recall; the family column rides into the
    band key (see ``_BAND_KEYS``)."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _PHASH_BAND_BITS,
        _PHASH_BANDS,
    )

    mask = (1 << _PHASH_BAND_BITS) - 1
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftrightunsigned(F.col(fp_col), b * _PHASH_BAND_BITS)
            .bitwiseAND(mask)
            .alias("band_val"),
        )
        for b in range(_PHASH_BANDS)
    ]
    return fp_df.select(
        F.col(doc_col).alias("doc"),
        F.col(fp_col).alias("fp"),
        F.col("family"),
        F.explode(F.array(*bands)).alias("bk"),
    ).select("doc", "fp", "family", "bk.band_id", "bk.band_val")


def _frame_band_frame(
    fp_df: DataFrame, doc_col: str, fps_col: str
) -> DataFrame:
    """PER-FRAME banding for ``granularity='frame'`` video states:
    (doc, fhashes array, family) -> (doc, frame_id, fp, family,
    band_id, band_val) — posexplode to the sampled frames (bounded by
    the sample budget), then the same 7x9 pigeonhole per frame. Band
    extraction stays pure bit arithmetic over the stored arrays:
    frame_id lives in the PROBE surface, not the storage key, so doc
    updates/deletes replace the whole row and can never strand stale
    frame rows."""
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        _PHASH_BAND_BITS,
        _PHASH_BANDS,
    )

    mask = (1 << _PHASH_BAND_BITS) - 1
    frames = fp_df.select(
        F.col(doc_col).alias("doc"),
        F.col("family"),
        F.posexplode(F.col(fps_col)).alias("frame_id", "fp"),
    )
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftrightunsigned(F.col("fp"), b * _PHASH_BAND_BITS)
            .bitwiseAND(mask)
            .alias("band_val"),
        )
        for b in range(_PHASH_BANDS)
    ]
    return frames.select(
        "doc", "frame_id", "fp", "family",
        F.explode(F.array(*bands)).alias("bk"),
    ).select(
        "doc", "frame_id", "fp", "family", "bk.band_id", "bk.band_val"
    )


class FingerprintIndexSink(PartitionedParquetUpsertSink):
    """foreachBatch callable maintaining a streamed media-fingerprint
    index: one state row per document — (doc, fp, family,
    lsn[, __del]) —
    through the hash-partitioned LSN-guarded upsert. ``media`` picks
    the fingerprint family: 'image' (pHash over BMP/PNG/JPEG/GIF),
    'audio' (acoustic fingerprint over WAV/ADPCM/FLAC/subband),
    'video' (vhash over MCV/AVI-MJPEG/MJPEG), or 'auto' (per-row
    container sniff routing a MIXED stream to its family fingerprint
    in one pass — `operators/multimodal.media_fingerprints`);
    ``decoder`` passes through to the operator's magic-sniff dispatch
    for the fixed families.

    ``granularity`` (video only): 'clip' stores ONE fingerprint per
    document (the cheap default — a whole-clip re-encode collapses, a
    re-CUT sharing scenes can escape); 'frame' stores the PER-FRAME
    fingerprint array (`operators/multimodal.video_frame_fingerprints`)
    and defines duplication as >= ``min_match_frames`` matching frames
    — the recall path that catches re-cuts, at frames x bands probe
    rows per clip instead of bands. frame_id lives in the PROBE
    surface (posexplode at band time), never the storage key: doc
    updates replace one row, so stale frame rows are impossible by
    construction.

    ``lsn_col`` orders updates to the same doc across batches; absent,
    rows are stamped with the batch id (last batch wins).
    ``deleted_col`` makes the sink CDC-complete: soft-deleted docs stay
    in state under the LSN guard but are excluded from the probe
    surface. The banding parameters are structural (7x9 bits over a
    63-bit fingerprint, fixed by the fingerprint family), so only the
    family + decoder are recorded/validated in the params file — the
    `MinhashIndexSink.__minhash_params.json` discipline."""

    _PARAMS_FILE = "__fingerprint_params.json"

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        payload_col: str,
        media: str = "image",
        decoder: str = "auto",
        lsn_col: str | None = None,
        dlq_dir: str | None = None,
        n_partitions: int = 32,
        deleted_col: str | None = None,
        granularity: str = "clip",
        min_match_frames: int = 3,
    ):
        super().__init__(
            spark, state_dir, ["doc"], lsn_col="lsn",
            dlq_dir=dlq_dir, n_partitions=n_partitions,
        )
        if media not in _MEDIA_FP_FNS:
            raise ValueError(
                f"unknown media {media!r}: expected one of {_MEDIA_FP_FNS}"
            )
        if media == "auto" and decoder != "auto":
            raise ValueError(
                "media='auto' routes by container sniff; a fixed decoder "
                "contradicts it — pick the family explicitly instead"
            )
        if granularity not in ("clip", "frame"):
            raise ValueError(
                f"unknown granularity {granularity!r}: 'clip' or 'frame'"
            )
        if granularity == "frame" and media != "video":
            raise ValueError(
                "granularity='frame' stores per-sampled-frame "
                "fingerprints — only media='video' has frames"
            )
        if min_match_frames < 1:
            raise ValueError("min_match_frames must be >= 1")
        self.id_col = id_col
        self.payload_col = payload_col
        self.media = media
        self.decoder = decoder
        self.src_lsn_col = lsn_col
        self.deleted_col = deleted_col
        self.granularity = granularity
        self.min_match_frames = min_match_frames

    def _params(self) -> dict:
        from sqlserver_pg_cdc_spark.operators.multimodal import (
            _PHASH_BAND_BITS,
            _PHASH_BANDS,
        )

        out = {
            "media": self.media,
            "decoder": self.decoder,
            "id_col": self.id_col,
            "payload_col": self.payload_col,
            "bands": _PHASH_BANDS,
            "band_bits": _PHASH_BAND_BITS,
        }
        # state-shape parameter, recorded only when non-default so
        # pre-round-12 clip-granularity states keep validating
        if self.granularity != "clip":
            out["granularity"] = self.granularity
        return out

    def _check_params(self, create: bool = False) -> None:
        """An index built from one fingerprint family probed with
        another silently returns garbage candidates — record the
        parameters on first write, fail fast on mismatch at open."""
        import json
        import os

        if not os.path.isdir(self.target_dir):
            return
        pf = os.path.join(self.target_dir, self._PARAMS_FILE)
        mine = self._params()
        if os.path.exists(pf):
            with open(pf) as f:
                stored = json.load(f)
            if stored != mine:
                diff = {
                    kk: {"stored": stored.get(kk), "sink": v}
                    for kk, v in mine.items()
                    if stored.get(kk) != v
                }
                raise ValueError(
                    f"fingerprint state at {self.target_dir} was built "
                    f"with different parameters than this sink: {diff} — "
                    "open it with the recorded parameters or rebuild"
                )
            return
        if self._existing_parts():
            raise ValueError(
                f"fingerprint state at {self.target_dir} holds partitions "
                f"but no {self._PARAMS_FILE} — its fingerprint family is "
                "unknown; rebuild the state"
            )
        if create:
            with open(pf, "w") as f:
                json.dump(mine, f)

    def _project(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Batch -> one (doc, fp, family, lsn[, __del]) row per document
        in ONE Arrow mapInPandas pass: the fingerprint operator decodes
        each payload once, and lsn/__del ride through as keep_cols — no
        re-decode, no batch-sized join back. Docs whose payload does
        not decode keep a NULL fp (they can never collide) but still
        own a state row, so a later payload update or delete lands;
        that includes non-delete rows with a NULL payload. ``family``
        is the sink's fixed family, or per-row container sniff under
        ``media='auto'`` (one mixed crawl topic, one sink — images
        dedup against images, audio against audio, video against
        video, never across).

        Integer riders cross the pandas boundary AS STRINGS
        (`functions/riders`): a nullable long column entering pandas
        becomes float64 (one NULL anywhere poisons the whole column),
        silently corrupting every LSN past 2^53 before our code ever
        sees it — the Int64-inference trap the fingerprint columns
        already guard against."""
        from sqlserver_pg_cdc_spark.functions.riders import (
            unwrap_int_riders,
            wrap_int_riders,
        )
        from sqlserver_pg_cdc_spark.operators import multimodal as mm

        lsn = (
            F.col(self.src_lsn_col).cast("long")
            if self.src_lsn_col
            else F.lit(int(batch_id)).cast("long")
        )
        extra = [lsn.alias("__lsn")]
        src = batch_df
        if self.deleted_col:
            del_flag = F.coalesce(
                F.col(self.deleted_col).cast("string") == F.lit("true"),
                F.lit(False),
            )
            # NULL-payload non-delete rows stay in: they fingerprint
            # NULL and pass un-gated but still own a state row — the
            # same contract as deleted_col=None (round-10 ADVICE: the
            # old payload-or-delete filter silently dropped them)
            extra.append(del_flag.cast("string").alias("__del_s"))
        keep = ["__lsn"] + (["__del_s"] if self.deleted_col else [])
        pre = wrap_int_riders(
            src.select(F.col(self.id_col), F.col(self.payload_col), *extra),
            ["__lsn"],
        )
        fam = F.lit(self.media)
        if self.media == "video" and self.granularity == "frame":
            out = mm.video_frame_fingerprints(
                pre, self.id_col, self.payload_col,
                decoder=self.decoder, keep_cols=tuple(keep),
            )
            fp_col = "fhashes"
        elif self.media == "image":
            out = mm.phash_images(
                pre, self.id_col, self.payload_col,
                decoder=self.decoder, keep_cols=tuple(keep),
            )
            fp_col = "phash"
        elif self.media == "audio":
            out = mm.audio_fingerprints(
                pre, self.id_col, self.payload_col,
                decoder=self.decoder, keep_cols=tuple(keep),
            )
            fp_col = "afp"
        elif self.media == "video":
            out = mm.video_fingerprints(
                pre, self.id_col, self.payload_col,
                decoder=self.decoder, keep_cols=tuple(keep),
            )
            fp_col = "vhash"
        else:  # auto: per-row container sniff, one decode pass
            out = mm.media_fingerprints(
                pre, self.id_col, self.payload_col, keep_cols=tuple(keep)
            )
            fp_col = "fp"
            fam = F.col("family")
        out = unwrap_int_riders(out, ["__lsn"])
        post = [F.col("__lsn").alias("lsn")]
        if self.deleted_col:
            post.append(
                (F.col("__del_s") == F.lit("true")).alias("__del")
            )
        return out.select(
            F.col("doc_id").alias("doc"),
            F.col(fp_col).alias("fp"),
            fam.alias("family"),
            *post,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.streaming.apply import widen_small_batch

        # an under-parallelized batch would run the payload-decode
        # projection on one task (guide §2.5); no-op at session width
        self._upsert_projected(
            self._project(widen_small_batch(batch_df), batch_id), batch_id
        )

    def _upsert_projected(self, proj_df: DataFrame, batch_id: int) -> None:
        import os

        os.makedirs(self.target_dir, exist_ok=True)
        self._check_params(create=True)
        super().__call__(proj_df, batch_id)

    # -- query surface ------------------------------------------------------

    def _live_state(self) -> DataFrame | None:
        self._check_params()
        st = self.read_target()
        if st is None:
            return None
        if "family" not in st.columns:
            # pre-round-11 states stored (doc, fp) without the family
            # column that now rides every band-join key; probing such a
            # state would otherwise die in a bare AnalysisException
            # deep inside a select (round-11 ADVICE) — name the
            # migration instead
            raise ValueError(
                f"fingerprint state at {self.target_dir} predates the "
                "'family' state column (pre-round-11 layout) — rebuild "
                "the index by re-ingesting the corpus, or backfill a "
                "constant family column matching the recorded 'media' "
                "parameter into every state partition"
            )
        if "__del" in st.columns:
            st = st.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        return st

    def fingerprints(self) -> DataFrame | None:
        """The stored (doc, fp, family) of live docs — (doc, fp) plugs
        directly into `operators/multimodal.phash_near_pairs` as a
        batch frame; family scopes comparability (constant for a
        fixed-family sink, per-row under ``media='auto'``)."""
        st = self._live_state()
        if st is None:
            return None
        return st.select("doc", "fp", "family")

    def index(self) -> DataFrame | None:
        """The banded probe surface over live docs with a decodable
        fingerprint: (doc, fp, family, band_id, band_val) — plus a
        ``frame_id`` column under ``granularity='frame'``, where the
        stored per-frame arrays posexplode to frames x bands rows.
        Band extraction is pure bit arithmetic, so nothing beyond the
        (doc, fp/fhashes, family) state row is ever stored."""
        fp = self.fingerprints()
        if fp is None:
            return None
        fp = fp.filter(F.col("fp").isNotNull())
        if self.granularity == "frame":
            return _frame_band_frame(fp, "doc", "fp")
        return _fp_band_frame(fp, "doc", "fp")

    def near_dups(
        self, new_df: DataFrame, max_hamming: int = 6
    ) -> DataFrame | None:
        """Near-dups of a NEW batch against the streamed index:
        (a=new id, b=indexed id, hamming <= max_hamming). Work ∝ new
        batch + collisions: only the new payloads are decoded; the band
        join hits the stored index; both fingerprints ride the band
        frames, so exact verification is a bit_count in the join
        output — no state refetch at all. Returns a persisted,
        materialized frame; the caller owns the unpersist."""
        idx = self.index()
        if idx is None:
            return None
        proj = self._project(new_df, batch_id=0)
        probe = proj.filter(F.col("fp").isNotNull()).select(
            "doc", "fp", "family"
        )
        return self._near_dups_core(probe, max_hamming, idx=idx)

    def _near_dups_core(
        self,
        new_fp: DataFrame,
        max_hamming: int,
        new_bands: DataFrame | None = None,
        idx: DataFrame | None = None,
        eager: bool = True,
        dedup_pairs: bool = True,
    ) -> DataFrame | None:
        """Probe with an ALREADY-computed (doc, fp) frame — the seam
        `MediaDedupGateSink` uses to share one decode pass across
        probe/cluster/index. ``new_bands``/``idx`` accept precomputed
        band/index frames so the gate bands the batch ONCE for both
        the cross-corpus and within-batch joins, and a caller that
        already read the index for a None check never replans the
        state read (round-10 ADVICE). Returns a persisted, materialized
        (a, b, hamming) frame; the caller owns the unpersist.
        ``eager=False`` (the gate path) skips the materializing count —
        the gate's clustering collect computes the frame into its
        persist one action later anyway. ``dedup_pairs=False`` (gate
        path only) additionally drops the multi-band-duplicate
        ``distinct`` — a full exchange of the verified pair set — when
        the consumer is duplicate-insensitive: the gate reduces cross
        pairs with a per-`a` row_number window, which picks one row
        whether a pair matched in one band or four (guide §2.4). The
        public ``near_dups`` contract (one row per pair) keeps the
        distinct."""
        if idx is None:
            idx = self.index()
        if idx is None:
            return None
        if self.granularity == "frame":
            nb = (
                new_bands
                if new_bands is not None
                else _frame_band_frame(new_fp, "doc", "fp")
            )
            res = self._frame_pair_agg(
                nb.select(
                    F.col("doc").alias("a"),
                    F.col("frame_id").alias("fa"),
                    F.col("fp").alias("ha"), *_BAND_KEYS,
                ).join(
                    idx.select(
                        F.col("doc").alias("b"),
                        F.col("frame_id").alias("fb"),
                        F.col("fp").alias("hb"), *_BAND_KEYS,
                    ),
                    _BAND_KEYS,
                ).filter(F.col("a") != F.col("b")),
                max_hamming,
            ).persist()
            if eager:
                res.count()
            return res
        nb = (
            new_bands
            if new_bands is not None
            else _fp_band_frame(new_fp, "doc", "fp")
        )
        ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
        res = (
            nb.select(
                F.col("doc").alias("a"), F.col("fp").alias("ha"),
                *_BAND_KEYS,
            )
            .join(
                idx.select(
                    F.col("doc").alias("b"), F.col("fp").alias("hb"),
                    *_BAND_KEYS,
                ),
                _BAND_KEYS,
            )
            .filter(F.col("a") != F.col("b"))
            .select("a", "b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
        )
        if dedup_pairs:
            res = res.distinct()
        res = res.persist()
        if eager:
            res.count()
        return res

    def _frame_pair_agg(
        self, joined: DataFrame, max_hamming: int
    ) -> DataFrame:
        """Frame-pair candidates -> clip pairs under the >= k matching
        frames law (`operators/multimodal.vframe_near_clip_pairs`
        verbatim): exact bit_count verify per frame pair, then ONE
        aggregation per surviving clip pair — matched-frame count is
        the symmetric minimum of distinct matched frames per side (a
        static repeated scene cannot inflate the overlap), reported
        ``hamming`` is the pair's best frame match so the gate's
        min-score tie-break stays meaningful."""
        ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
        return (
            joined.select("a", "fa", "b", "fb", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            # no .distinct(): multi-band duplicates of one frame pair
            # cannot move countDistinct/min below — the dedup exchange
            # was a full extra shuffle of the candidate set for nothing
            .groupBy("a", "b")
            .agg(
                F.least(
                    F.countDistinct("fa"), F.countDistinct("fb")
                ).cast("long").alias("n_frames"),
                F.min("hamming").alias("hamming"),
            )
            .filter(F.col("n_frames") >= self.min_match_frames)
            .select("a", "b", "hamming")
        )


class MediaDedupGateSink(GatedIndexMixin, FingerprintIndexSink):
    """Ingest-time MEDIA near-dup GATE on the shared
    `streaming/gate.GatedIndexMixin` skeleton: each micro-batch is
    probed BEFORE indexing —

    1. cross-corpus: batch docs whose fingerprint lands within
       ``max_hamming`` of an already-indexed doc are routed to the dup
       log (kind='corpus', best match by min hamming / min indexed id),
       not indexed;
    2. within-batch: the remaining docs are clustered among themselves
       (banded Hamming + connected components) and only each cluster's
       CANONICAL member — its minimum doc id — survives
       (kind='batch');
    3. survivors upsert into the fingerprint index, becoming the
       standing corpus the NEXT batch probes.

    A WAV and its FLAC re-encode — or a PNG and BMP of one image —
    arriving in DIFFERENT micro-batches therefore dedup: the first
    indexes, the second probes against it at Hamming 0.

    The dup log is one parquet generation PER BATCH ID
    (``dups_dir/batch_<id>/``, overwrite — exactly-once under replay);
    rows (doc, dup_of, hamming, kind 'corpus'|'batch', __batch_id),
    hamming NULL for transitively-linked batch members. CDC deletes
    bypass the gate; undecodable payloads pass un-gated with a NULL
    fingerprint state row.

    The batch is BANDED ONCE: one band frame off the checkpointed
    decode feeds both the cross-corpus probe join and the within-batch
    self-join (the within-batch side anti-joins corpus rejects out of
    the same frame)."""

    _GATE_NAME = "MediaDedupGateSink"
    _GATE_LABEL = "media gate"
    _SCORE_COL = "hamming"
    _SCORE_BEST_ASC = True  # smaller Hamming = closer
    _SCORE_TYPE = "bigint"  # hamming logs as long, not double

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        dups_dir: str,
        id_col: str,
        payload_col: str,
        max_hamming: int = 6,
        **kw,
    ):
        super().__init__(spark, state_dir, id_col, payload_col, **kw)
        self.dups_dir = dups_dir
        self.max_hamming = max_hamming

    def _gate_surface(self, live: DataFrame) -> dict:
        """(doc, fp) probe frame + ITS band frame, both lazy views over
        the checkpointed decode — payload decode, the dominant media
        batch cost, ran exactly once. Under ``granularity='frame'``
        the band frame carries frames x bands rows (posexplode of the
        stored arrays)."""
        probe = live.filter(F.col("fp").isNotNull()).select(
            "doc", "fp", "family"
        )
        bands = (
            _frame_band_frame(probe, "doc", "fp")
            if self.granularity == "frame"
            else _fp_band_frame(probe, "doc", "fp")
        )
        return {"probe": probe, "bands": bands}

    def _gate_cross_pairs(self, surface, blocks) -> DataFrame | None:
        cross = self._near_dups_core(
            surface["probe"], self.max_hamming,
            new_bands=surface["bands"], eager=False, dedup_pairs=False,
        )
        if cross is not None:
            blocks.append(cross)
        return cross

    def _gate_quotient(self, surface) -> tuple:
        """Identical fingerprints WITHIN a family collapse to one
        representative: the band keys are bit-slices of (family, fp),
        and two equal fingerprints sit at Hamming 0 — always an edge
        for scalar states (max_hamming >= 0); for frame states the
        clip's self-match count is its own frame count, so clips
        shorter than min_match_frames stay singletons (the direct
        path's outcome for them too — they cannot pair with anything,
        not even an identical twin)."""
        return surface["probe"].select("doc", "family", "fp"), [
            "family", "fp",
        ]

    def _gate_self_score(self, reps) -> DataFrame:
        if self.granularity == "frame":
            # the >=k matching-frames law vs an identical twin: every
            # sampled frame matches itself at Hamming 0, so the matched
            # count is the clip's own (posexplode-distinct) frame count
            return reps.select(
                "doc",
                F.lit(0).cast("long").alias("hamming"),
                F.size("fp").alias("__nf"),
            ).filter(
                F.col("__nf") >= self.min_match_frames
            ).select("doc", "hamming")
        ham = F.bit_count(
            F.col("fp").bitwiseXOR(F.col("fp"))
        ).cast("long")
        return reps.select("doc", ham.alias("hamming")).filter(
            F.col("hamming") <= self.max_hamming
        )

    def _gate_batch_pairs(self, surface, reject_docs, blocks) -> DataFrame:
        """Banded self-join + exact Hamming verify — fingerprints ride
        the band frame, so verification never refetches state. Under
        ``granularity='frame'`` the self-join runs per frame and the
        >= k matching-frames aggregation decides the clip pair."""
        kb = surface["bands"]
        if reject_docs is not None:
            kb = kb.join(reject_docs, "doc", "left_anti")
        if self.granularity == "frame":
            pairs = self._frame_pair_agg(
                kb.select(
                    F.col("doc").alias("a"),
                    F.col("frame_id").alias("fa"),
                    F.col("fp").alias("ha"), *_BAND_KEYS,
                ).join(
                    kb.select(
                        F.col("doc").alias("b"),
                        F.col("frame_id").alias("fb"),
                        F.col("fp").alias("hb"), *_BAND_KEYS,
                    ),
                    _BAND_KEYS,
                ).filter(F.col("a") < F.col("b")),
                self.max_hamming,
            ).persist()
            # persisted, not counted: the clustering collect that
            # follows in the gate template materializes it in one job
            blocks.append(pairs)
            return pairs
        ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
        pairs = (
            kb.select(
                F.col("doc").alias("a"), F.col("fp").alias("ha"),
                *_BAND_KEYS,
            )
            .join(
                kb.select(
                    F.col("doc").alias("b"), F.col("fp").alias("hb"),
                    *_BAND_KEYS,
                ),
                _BAND_KEYS,
            )
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", ham.alias("hamming"))
            .filter(F.col("hamming") <= self.max_hamming)
            .distinct()
            .persist()
        )
        # persisted, not counted — same rationale as the frame branch
        blocks.append(pairs)
        return pairs
