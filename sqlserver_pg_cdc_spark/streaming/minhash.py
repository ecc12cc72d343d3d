"""Streaming-maintained MinHash band index: a foreachBatch sink keeping
the text-dedup LSH index (`operators/dedup.minhash_index`) continuously
up to date from a document change stream.

The batch story persists the corpus band index once and probes it with
new batches (`minhash_incremental_dedup`); here the index ITSELF is the
streamed state — a continuously-ingesting corpus never rebuilds it.
Each micro-batch upserts ONE ROW PER DOCUMENT — (doc, sh, bands, lsn)
with the doc's full shingle set and band-key array — through the
hash-partitioned LSN-guarded upsert (`PartitionedParquetUpsertSink`),
touching only the partitions the batch hits. A re-ingested doc with
CHANGED text replaces its whole row, so stale band keys cannot linger
(the one-row-per-doc layout is what makes the upsert atomic per doc —
band rows split across files could half-update). Storing the shingle
set beside the bands means the exact-Jaccard verify step never
re-tokenizes corpus text: colliding docs' shingles come straight from
the index partitions.

Query side: ``index()`` explodes the stored band arrays to the (doc,
band_id, band_key) shape the batch operators consume — it plugs
directly into `minhash_incremental_dedup` as ``index_df``;
``near_dups(new)`` runs the full incremental probe against the streamed
state (candidates from the band join, verification against stored
shingles). Streamed state == one-shot index is pytest-pinned, and the
``text_dedup_streamed_index`` catalog query keeps it oracle-green.

LSH parameters (num_hashes, bands, k) are baked into the stored keys:
they are recorded in the state dir on first write and validated on
every open, the same discipline `AnnIndexSink.__ann_params.json`
applies to its hyperplanes.

Reference analog: the reference maintains reconciliation state
incrementally per change batch (src/reconciliation/incremental/
state.py:112-164); this is the same discipline applied to a text-dedup
index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.streaming.apply import PartitionedParquetUpsertSink
from sqlserver_pg_cdc_spark.streaming.gate import GatedIndexMixin

# Unresolved-Column cache for the per-row minhash projection: building
# the 16 aggregate() HOFs + band md5 structs costs ~1.5 s of pure
# Python/py4j time (one lambda round-trip per HOF) — per BATCH if
# rebuilt inside _project. The Columns are unresolved expressions over
# fixed internal names (__pairs, h0..h15, sh), so they are reusable
# across DataFrames; keyed by applicationId so a restarted JVM never
# sees another gateway's object handles.
_PROJ_EXPR_CACHE: dict = {}


def _minhash_proj_exprs(spark: SparkSession, num_hashes: int, bands: int):
    from sqlserver_pg_cdc_spark.operators.dedup import _MH_MOD

    key = (spark.sparkContext.applicationId, num_hashes, bands)
    hit = _PROJ_EXPR_CACHE.get(key)
    if hit is not None:
        return hit
    rows = num_hashes // bands
    pairs = F.transform(
        F.col("sh"),
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 12), 16, 10)
            .cast("bigint")
            .alias("a"),
            F.conv(F.substring(F.md5(s), 13, 12), 16, 10)
            .cast("bigint")
            .alias("b"),
        ),
    )

    def _h(i: int):
        return F.aggregate(
            F.col("__pairs"),
            F.lit(_MH_MOD).cast("bigint"),
            lambda acc, x: F.least(
                acc, F.pmod(x["a"] + F.lit(i) * x["b"], F.lit(_MH_MOD))
            ),
        )

    hs = [_h(i).alias(f"h{i}") for i in range(num_hashes)]
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws("|", *[f"h{b * rows + r}" for r in range(rows)])
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    empty_bands = F.array().cast("array<struct<band_id:int,band_key:string>>")
    bands_col = (
        F.when(F.size("sh") > 0, F.array(*band_structs))
        .otherwise(empty_bands)
        .alias("bands")
    )
    out = (pairs, hs, bands_col)
    _PROJ_EXPR_CACHE[key] = out
    return out


class MinhashIndexSink(PartitionedParquetUpsertSink):
    """foreachBatch callable: ``writeStream.foreachBatch(sink)``.

    ``lsn_col`` orders updates to the same doc across batches (CDC
    streams carry one); without it each row is stamped with its batch
    id — last batch wins. ``deleted_col`` (optional) makes the sink
    CDC-complete: soft-deleted docs stay in state under the LSN guard
    (a late stale update cannot resurrect them) but are excluded from
    ``index()``/``shingles()``/``near_dups()``."""

    _PARAMS_FILE = "__minhash_params.json"

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        text_col: str,
        lsn_col: str | None = None,
        num_hashes: int = 16,
        bands: int = 4,
        k: int = 3,
        dlq_dir: str | None = None,
        n_partitions: int = 32,
        deleted_col: str | None = None,
    ):
        super().__init__(
            spark, state_dir, ["doc"], lsn_col="lsn",
            dlq_dir=dlq_dir, n_partitions=n_partitions,
        )
        if num_hashes % bands != 0:
            raise ValueError("num_hashes must divide evenly into bands")
        self.id_col = id_col
        self.text_col = text_col
        self.src_lsn_col = lsn_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.deleted_col = deleted_col

    def _params(self) -> dict:
        return {
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "k": self.k,
            "id_col": self.id_col,
            "text_col": self.text_col,
        }

    def _check_params(self, create: bool = False) -> None:
        """State written with one (num_hashes, bands, k) probed with
        another silently returns wrong/empty candidates — record the
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
                    f"MinHash state at {self.target_dir} was built with "
                    f"different LSH parameters than this sink: {diff} — "
                    "probing it would band with mismatched hash families; "
                    "open it with the recorded parameters or rebuild"
                )
            return
        if self._existing_parts():
            raise ValueError(
                f"MinHash state at {self.target_dir} holds partitions but "
                f"no {self._PARAMS_FILE} — its LSH parameters are unknown; "
                "rebuild the state"
            )
        if create:
            with open(pf, "w") as f:
                json.dump(mine, f)

    def _project(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Batch -> one (doc, sh, bands, lsn[, __del]) row per document,
        as a PURE NARROW PROJECTION — no explode, no groupBy, no join.

        The batch operators compute signatures by exploding shingles and
        folding mins in a hash aggregate (one shuffle), then band-join
        back; per-document that is exactly a per-row fold, so here each
        h_i is an ``aggregate()`` HOF over the row's shingle array —
        identical values (min over the same (a + i*b) mod M family, md5
        computed ONCE per shingle: the pairs array is its own projection
        step, and CollapseProject keeps multiply-referenced non-cheap
        aliases materialized), zero exchanges. Measured ~2x off the
        per-batch ingest cost at sf0.1. Docs whose text shingles to
        nothing keep an EMPTY band array (they can never collide) but
        still own a state row, so a later text update or delete lands
        on them. The hash/band Columns come from the module-level
        expression cache — rebuilding them per batch costs ~1.5 s of
        driver-side py4j time, pure overhead at any data scale."""
        from sqlserver_pg_cdc_spark.operators.dedup import (
            shingles_from_tokens,
            tokens,
        )

        pairs, hs, bands_col = _minhash_proj_exprs(
            self.spark, self.num_hashes, self.bands
        )
        lsn = (
            F.col(self.src_lsn_col).cast("long")
            if self.src_lsn_col
            else F.lit(int(batch_id)).cast("long")
        )
        extra = [lsn.alias("lsn")]
        src = batch_df
        if self.deleted_col:
            del_flag = F.coalesce(
                F.col(self.deleted_col).cast("string") == F.lit("true"),
                F.lit(False),
            )
            src = batch_df.filter(F.col(self.text_col).isNotNull() | del_flag)
            extra.append(del_flag.alias("__del"))
        extra_names = ["lsn"] + (["__del"] if self.deleted_col else [])
        step1 = src.select(
            F.col(self.id_col).alias("doc"),
            tokens(self.text_col).alias("__toks"),
            *extra,
        )
        step2 = step1.select(
            "doc",
            F.coalesce(
                shingles_from_tokens("__toks", self.k),
                F.array().cast("array<string>"),
            ).alias("sh"),
            *extra_names,
        )
        step3 = step2.select(
            "doc", "sh", pairs.alias("__pairs"), *extra_names
        )
        step4 = step3.select("doc", "sh", *hs, *extra_names)
        return step4.select("doc", "sh", bands_col, *extra_names)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.streaming.apply import widen_small_batch

        # an under-parallelized batch would run the shingle/minhash
        # projection on one task (guide §2.5); no-op at session width
        self._upsert_projected(
            self._project(widen_small_batch(batch_df), batch_id), batch_id
        )

    def _upsert_projected(self, proj_df: DataFrame, batch_id: int) -> None:
        """Upsert rows ALREADY in the stored (doc, sh, bands, lsn[,
        __del]) shape — the seam DedupGateSink uses to index its
        survivors without re-projecting the batch."""
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
        if "__del" in st.columns:
            # NULL deleted-flag is live (matches CdcPipeline.active_rows)
            st = st.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        return st

    def index(self) -> DataFrame | None:
        """The (doc, band_id, band_key) band index over the streamed
        state — the exact shape `minhash_index` computes one-shot, and
        the ``index_df`` input `minhash_incremental_dedup` probes.
        Soft-deleted docs excluded."""
        st = self._live_state()
        if st is None:
            return None
        return st.select("doc", F.explode("bands").alias("bk")).select(
            "doc", "bk.band_id", "bk.band_key"
        )

    def shingles(self) -> DataFrame | None:
        """The stored (doc, sh) shingle sets of live docs — what the
        exact-Jaccard verify joins against instead of re-tokenizing
        corpus text."""
        st = self._live_state()
        if st is None:
            return None
        return st.select("doc", "sh")

    def near_dups(
        self, new_df: DataFrame, threshold: float = 0.5
    ) -> DataFrame | None:
        """Near-dups of a NEW batch against the streamed index:
        (a=new id, b=indexed id, jaccard >= threshold). Work ∝ new
        batch + collisions: only the new docs are shingled/hashed; the
        band join hits the stored index; verification joins candidates
        to STORED shingles (no corpus re-tokenize — an equi-join on the
        colliding doc ids, partition-prunable by the state's doc hash)."""
        from sqlserver_pg_cdc_spark.operators.dedup import (
            minhash_band_frame,
            minhash_signatures_from_shingles,
            shingle_frame,
        )

        if self.index() is None:
            return None
        from sqlserver_pg_cdc_spark.streaming.apply import widen_small_batch

        rows = self.num_hashes // self.bands
        # localCheckpoint: same plan-truncation rationale as the gate's
        # batch projection — the probe frame is batch-sized and feeds
        # several downstream actions. Widened first (an
        # under-parallelized probe batch would shingle on one task,
        # guide §2.5) and LAZY: the probe's first bounded collect
        # materializes it inside its own job (guide §1/§5)
        new_sh = shingle_frame(
            widen_small_batch(new_df), self.id_col, self.text_col, self.k
        ).localCheckpoint(eager=False)
        nsh = new_sh.filter(F.size("sh") > 0)
        new_sig = minhash_signatures_from_shingles(nsh, self.num_hashes)
        new_bands = minhash_band_frame(new_sig, self.bands, rows)
        return self._near_dups_core(nsh, new_bands, threshold)

    def _near_dups_core(
        self,
        nsh: DataFrame,
        new_bands: DataFrame,
        threshold: float,
        defer_blocks: list | None = None,
    ) -> DataFrame | None:
        """Probe with ALREADY-computed (doc, sh) and (doc, band_id,
        band_key) frames for the new batch — the seam DedupGateSink uses
        to share one projection across probe/cluster/index. Returns a
        persisted, materialized (a, b, jaccard) frame; the caller owns
        the unpersist.

        ``defer_blocks`` (the gate path): the candidate frame is
        appended there instead of being unpersisted here, and the
        result is returned persisted but NOT eagerly counted — the
        gate's next action (within-batch clustering) materializes both
        in one job, dropping two scheduler round trips per batch. The
        caller then owns BOTH unpersists (the gate template's finally
        block)."""
        idx = self.index()
        if idx is None:
            return None
        cands = (
            new_bands.join(idx, ["band_id", "band_key"])
            .select(new_bands.doc.alias("a"), idx.doc.alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist()
        )
        if defer_blocks is not None:
            defer_blocks.append(cands)
        try:
            # partition-pruned fetch: when the colliding-doc set is
            # bounded (limit(bound+1) probe — the usual case: collisions
            # are O(near-dups), not O(corpus)), open ONLY the state
            # partitions those docs hash to instead of scanning all
            # n_partitions directories; past the bound, fall back to
            # the full-state semi-join. The probe limit IS the pruning
            # bound below: collecting 10k ids to then prune only when
            # len <= n_partitions moved thousands of rows to the driver
            # per batch for a decision that needs at most bound+1.
            # The probe itself only pays past a handful of partitions:
            # at <= 8 dirs the most it can prune is a few bounded,
            # footer-free directory reads, while the probe costs a
            # scheduler round trip PLUS a separate plan+materialization
            # of the candidate tree every batch (measured: 5 AQE jobs
            # + ~1 s planning gap per text-gate batch at sf0.1) — so
            # small layouts skip straight to the full semi-join; the
            # production-scale layouts (32+ partitions) keep pruning.
            stored = None
            if self.n_partitions > 8:
                prune_bound = min(10_000, self.n_partitions)
                ids = [
                    r["b"]
                    for r in cands.select("b").distinct()
                    .limit(prune_bound + 1).collect()
                ]
                # pruning pays only when the colliding-doc set is small
                # relative to the partition count — past ~n_partitions
                # distinct ids the birthday bound says every partition
                # is hit anyway, and the probe's extra hash job +
                # per-key semi-join just add fixed cost over the
                # full-state read
                if ids and len(ids) <= prune_bound:
                    hit = self.read_keys(ids)
                    if hit is not None:
                        if "__del" in hit.columns:
                            hit = hit.filter(
                                ~F.coalesce(F.col("__del"), F.lit(False))
                            )
                        stored = hit.select("doc", "sh")
            if stored is None:
                stored = self.shingles()
            b = stored.join(
                cands.select(F.col("b").alias("doc")).distinct(),
                "doc",
                "left_semi",
            ).select(F.col("doc").alias("b"), F.col("sh").alias("sh_b"))
            a = nsh.select(
                F.col("doc").alias("a"), F.col("sh").alias("sh_a")
            )
            inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
            result = (
                cands.join(a, "a")
                .join(b, "b")
                .select("a", "b", (inter / union).alias("jaccard"))
                .filter(F.col("jaccard") >= threshold)
            )
            result = result.persist()
            if defer_blocks is None:
                result.count()
            return result
        finally:
            if defer_blocks is None:
                cands.unpersist()


class DedupGateSink(GatedIndexMixin, MinhashIndexSink):
    """Ingest-time near-dup GATE: the production shape of continuous
    corpus dedup, on the shared `streaming/gate.GatedIndexMixin`
    skeleton. Each micro-batch is probed BEFORE indexing —

    1. cross-corpus: batch docs near-dup'ing an already-indexed doc
       (``near_dups`` against the streamed state) are routed to the
       dup log, not indexed;
    2. within-batch: the remaining docs are clustered among themselves
       (LSH + exact-Jaccard verify + connected components) and only
       each cluster's CANONICAL member — its minimum doc id — survives;
    3. survivors upsert into the band index through the partitioned
       LSN-guarded path, becoming the standing corpus the NEXT batch
       probes.

    The dup log is one parquet generation PER BATCH ID
    (``dups_dir/batch_<id>/``, overwrite) — a Structured Streaming
    replay of a crashed batch rewrites its own generation instead of
    appending duplicates, so ``dup_log()`` is exactly-once without any
    read-side dedup. Rows: (doc, dup_of, jaccard, kind 'corpus'|'batch',
    __batch_id).

    CDC deletes (``deleted_col``) bypass the gate: a delete must reach
    the index even though its doc has no text to probe.

    Reference analog: the reference applies each change batch against
    persisted incremental state before accepting it
    (src/reconciliation/incremental/state.py:112-164); here "state" is
    the dedup index and "apply" includes the accept/reject decision."""

    _GATE_NAME = "DedupGateSink"
    _GATE_LABEL = "dedup gate"
    _SCORE_COL = "jaccard"
    _SCORE_BEST_ASC = False  # higher Jaccard = closer

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        dups_dir: str,
        id_col: str,
        text_col: str,
        threshold: float = 0.5,
        **kw,
    ):
        super().__init__(spark, state_dir, id_col, text_col, **kw)
        self.dups_dir = dups_dir
        self.threshold = threshold

    def _gate_surface(self, live: DataFrame) -> dict:
        """Shingle sets + exploded band keys off the one shared
        projection — tokenize/md5/minhash/band ran exactly once (the
        naive composition re-shingled the batch three times; at 100 TB
        the signature map IS the dominant batch cost)."""
        nsh = live.select("doc", "sh").filter(F.size("sh") > 0)
        bands = live.select(
            "doc", F.explode("bands").alias("bk")
        ).select("doc", "bk.band_id", "bk.band_key")
        return {"nsh": nsh, "bands": bands}

    def _gate_cross_pairs(self, surface, blocks) -> DataFrame | None:
        cross = self._near_dups_core(
            surface["nsh"], surface["bands"], self.threshold,
            defer_blocks=blocks,
        )
        if cross is not None:
            blocks.append(cross)
        return cross

    # no _gate_quotient here: the text quotient key would be the full
    # shingle ARRAY — windowing the batch by it ships the same heavy
    # payload bytes the pair path's verify joins already pay once, and
    # a paired A/B measured the direct path faster at every duplicate
    # density the fixtures carry (exact-duplicate text belongs to the
    # upstream exact-dedup stage, not this gate's near-dup machinery)

    def _gate_batch_pairs(self, surface, reject_docs, blocks) -> DataFrame:
        """LSH candidates from the SHARED band frame (self-join on the
        composite band key), exact Jaccard from the shared shingles."""
        rem_bands, rem_sh = surface["bands"], surface["nsh"]
        if reject_docs is not None:
            rem_bands = rem_bands.join(reject_docs, "doc", "left_anti")
            rem_sh = rem_sh.join(reject_docs, "doc", "left_anti")
        cands = (
            rem_bands.select(F.col("doc").alias("a"), "band_id", "band_key")
            .join(
                rem_bands.select(
                    F.col("doc").alias("b"), "band_id", "band_key"
                ),
                ["band_id", "band_key"],
            )
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        pairs = (
            cands.join(
                rem_sh.select(F.col("doc").alias("a"), F.col("sh").alias("sh_a")),
                "a",
            )
            .join(
                rem_sh.select(F.col("doc").alias("b"), F.col("sh").alias("sh_b")),
                "b",
            )
            .select("a", "b", (inter / union).alias("jaccard"))
            .filter(F.col("jaccard") >= self.threshold)
            .persist()
        )
        # persisted but NOT eagerly counted: the clustering collect
        # that immediately follows in the gate template materializes it
        # (and, through its lineage, the probe's candidate blocks) in
        # one job — an eager count here was a pure extra round trip
        blocks.append(pairs)
        return pairs
