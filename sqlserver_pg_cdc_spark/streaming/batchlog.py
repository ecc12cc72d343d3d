"""Per-batch-id parquet logs with retention compaction.

The gate sinks (`streaming/minhash.DedupGateSink`,
`streaming/ann.AnnGateSink`, `streaming/decontam.DecontamGate`) log each
micro-batch's rejects/accepts as ONE parquet generation per batch id
(``<log_dir>/batch_<id>/``, overwrite): a Structured Streaming replay of
a crashed batch rewrites its own generation instead of appending
duplicates, so the log is exactly-once without read-side dedup. The
liability is directory growth — one dir per micro-batch forever (~170k
dirs/day at 500 ms triggers). The reference bounds the same
unbounded-log liability with DLQ retention
(docker/configs/kafka-connect/postgresql-sink.json:44-49); this module
is the state-side twin of that policy, the same shape as
``purge_tombstones``' watermark contract.

``compact_batch_log(watermark_batch_id)`` folds every closed generation
at or below the watermark into one compacted parquet generation. The
CALLER owns the watermark contract: pass a batch id the stream can no
longer replay at or below (the checkpoint's committed batch minus any
reprocessing window). Batches ABOVE the watermark keep their one-dir-
per-batch overwrite-replay property untouched.

Crash-safety: the compacted rows land in a fresh ``gen_<uuid>/`` and are
row-count-verified while the meta file still references the old state;
then ``__compact_meta.json`` (generation name + watermark) swings in one
atomic tmp-write + rename — the single commit point (the manifest swing
discipline of ``sources/layout.write_manifested``). A reader resolving
the meta sees the old compaction or the new one, never half. Leftover
``batch_<id>`` dirs at or below the recorded watermark (crash before the
sweep, or a late replay of a compacted batch) are IGNORED by readers —
their rows are already in the compacted generation — and swept by the
next compaction.

Like the other day-2 maintenance ops (purge/rescale/prune), run on a
quiesced log: single writer, no concurrent gate batches.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_META = "__compact_meta.json"


def _meta_path(log_dir: str) -> str:
    return os.path.join(log_dir, _META)


def _read_meta(log_dir: str) -> dict | None:
    p = _meta_path(log_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_meta(log_dir: str, generation: str, watermark: int) -> None:
    """Atomic meta update: tmp write + one os.rename — the compaction's
    single commit point."""
    tmp = os.path.join(log_dir, f".{_META}_tmp_{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(
            {"generation": generation, "watermark_batch_id": int(watermark)},
            f,
        )
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _meta_path(log_dir))


def _batch_dirs(log_dir: str) -> list[tuple[int, str]]:
    out = []
    for d in glob.glob(os.path.join(log_dir, "batch_*")):
        name = os.path.basename(d)
        try:
            out.append((int(name.split("_", 1)[1]), d))
        except ValueError:
            continue
    return sorted(out)


def read_batch_log(
    spark: SparkSession, log_dir: str, schema: str | None = None
) -> DataFrame | None:
    """The full log: the compacted generation (if any) plus every batch
    generation ABOVE the compaction watermark. Batch dirs at or below
    the watermark are ignored — their rows are already in the compacted
    generation (they are crash leftovers or late replays of compacted
    batches; counting them would double rows).

    ``schema``: an explicit DDL for logs whose writer FIXES the column
    set (the gate dup logs: the template writes the same five columns
    every batch, id dtype pinned to the stored key dtype). The parquet
    reader maps columns by name and NULL-fills absentees — the exact
    mergeSchema semantics WITHOUT the footer-merge job Spark otherwise
    schedules per log open (guide §6; the r12 layout-stamp discipline
    applied to the last remaining footer job in the gate paths). Logs
    with open-ended columns (the decontam gates' accepted/quarantine
    logs carry arbitrary batch columns) keep the mergeSchema read."""
    if not os.path.isdir(log_dir):
        return None
    meta = _read_meta(log_dir)
    wm = None
    paths = []
    if meta is not None:
        wm = int(meta["watermark_batch_id"])
        gen_dir = os.path.join(log_dir, meta["generation"])
        if os.path.isdir(gen_dir):
            paths.append(gen_dir)
    paths.extend(
        d for bid, d in _batch_dirs(log_dir) if wm is None or bid > wm
    )
    if not paths:
        return None
    if schema:
        try:
            return spark.read.schema(schema).parquet(*paths)
        except Exception:
            pass  # unparseable ddl: footers stay authoritative
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def compact_batch_log(
    spark: SparkSession, log_dir: str, watermark_batch_id: int
) -> dict:
    """Fold every batch generation at or below ``watermark_batch_id``
    (plus the previous compacted generation) into ONE parquet
    generation. Returns ``{"compacted_batches": n, "rows": r,
    "watermark_batch_id": w}``. No-op when there is nothing at or below
    the watermark. Run quiesced (single writer) — ENFORCED since round
    10: the pass holds the ``__maintenance.lock`` sentinel on the log
    dir (`streaming/lock.py`), and the gates' per-batch log writes fail
    fast while it is held."""
    from sqlserver_pg_cdc_spark.streaming.lock import maintenance_lock

    wm = int(watermark_batch_id)
    if not os.path.isdir(log_dir):
        return {"compacted_batches": 0, "rows": 0, "watermark_batch_id": wm}
    with maintenance_lock(log_dir, "compact_batch_log"):
        return _compact_batch_log_locked(spark, log_dir, wm)


def _compact_batch_log_locked(
    spark: SparkSession, log_dir: str, wm: int
) -> dict:
    meta = _read_meta(log_dir)
    old_wm = int(meta["watermark_batch_id"]) if meta else None
    old_gen = (
        os.path.join(log_dir, meta["generation"]) if meta else None
    )
    if old_wm is not None and wm < old_wm:
        raise ValueError(
            f"watermark_batch_id {wm} is below the already-compacted "
            f"watermark {old_wm} at {log_dir} — compaction watermarks "
            "only move forward"
        )
    dirs = _batch_dirs(log_dir)
    # already folded in a previous compaction (crash leftovers or late
    # replays of compacted batches): delete without merging — their rows
    # are in the old generation already
    stale = [d for bid, d in dirs if old_wm is not None and bid <= old_wm]
    to_merge = [
        d for bid, d in dirs
        if bid <= wm and (old_wm is None or bid > old_wm)
    ]
    if not to_merge:
        for d in stale:
            shutil.rmtree(d, ignore_errors=True)
        if old_wm is not None and wm > old_wm and old_gen:
            # advance the watermark even with nothing new to fold, so
            # future replays at (old_wm, wm] stay ignored by readers
            _write_meta(log_dir, os.path.basename(old_gen), wm)
        return {"compacted_batches": 0, "rows": 0, "watermark_batch_id": wm}
    src_paths = ([old_gen] if old_gen and os.path.isdir(old_gen) else [])
    src_paths += to_merge
    df = spark.read.option("mergeSchema", "true").parquet(*src_paths)
    n_src = df.count()
    gen = f"gen_{uuid.uuid4().hex[:12]}"
    gen_dir = os.path.join(log_dir, gen)
    df.write.mode("overwrite").parquet(gen_dir)
    # verify the rewrite BEFORE the commit point — the meta still
    # references the old state, so a bad write changes nothing
    n_dst = spark.read.parquet(gen_dir).count()
    if n_dst != n_src:
        shutil.rmtree(gen_dir, ignore_errors=True)
        raise RuntimeError(
            f"compaction rewrite of {log_dir} lost rows "
            f"({n_src} -> {n_dst}); old layout left untouched"
        )
    _write_meta(log_dir, gen, wm)  # atomic commit point
    # sweep: merged batch dirs, stale leftovers, superseded generations
    for d in to_merge + stale:
        shutil.rmtree(d, ignore_errors=True)
    for g in glob.glob(os.path.join(log_dir, "gen_*")):
        if os.path.basename(g) != gen:
            shutil.rmtree(g, ignore_errors=True)
    for t in glob.glob(os.path.join(log_dir, f".{_META}_tmp_*")):
        try:
            os.remove(t)
        except OSError:
            pass
    return {
        "compacted_batches": len(to_merge),
        "rows": int(n_dst),
        "watermark_batch_id": wm,
    }


def retain_batches(
    spark: SparkSession, log_dir: str, n_retain: int
) -> dict:
    """Retention POLICY over :func:`compact_batch_log`: keep the newest
    ``n_retain`` batch generations replayable, fold everything older
    into the compacted generation — the reference's "30-day DLQ
    retention" knob (postgresql-sink.json:44-49) as one number.

    The watermark derives from the log's own latest committed batch id
    (max of the ``batch_<id>`` dirs and the recorded compaction
    watermark — the id space the driving stream's checkpoint committed
    through) minus ``n_retain``; the caller picks ``n_retain`` at or
    past the stream's reprocessing window. After the pass the log holds
    at most ``n_retain`` batch dirs plus one compacted generation, and
    replays ABOVE the watermark keep their exactly-once overwrite
    property untouched. No-op (never a watermark regression) when the
    log is empty or everything is already within the window."""
    if n_retain < 0:
        raise ValueError("n_retain must be >= 0")
    noop = {"compacted_batches": 0, "rows": 0, "watermark_batch_id": None}
    if not os.path.isdir(log_dir):
        return noop
    meta = _read_meta(log_dir)
    ids = [bid for bid, _ in _batch_dirs(log_dir)]
    if meta is not None:
        ids.append(int(meta["watermark_batch_id"]))
    if not ids:
        return noop
    wm = max(ids) - n_retain
    old_wm = int(meta["watermark_batch_id"]) if meta else None
    if wm < 0 or (old_wm is not None and wm <= old_wm):
        return dict(noop, watermark_batch_id=old_wm)
    return compact_batch_log(spark, log_dir, wm)
