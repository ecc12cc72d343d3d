"""The COMPOSED ingest pipeline as a product: one foreachBatch callable
chaining configured gate stages — e.g.

    text near-dup GATE  ->  eval-set DECONTAM gate  ->  streamed
    DIVERSITY sampler

`tests/test_ingest_pipeline.py` proved this chain stage-by-stage equal
to a batch-side recompute over the union; until round 12 a user had to
hand-wire three foreachBatch sinks and their artifact handoffs
(round-11 verdict #4). :class:`ChainedGateSink` owns the wiring: each
stage consumes the previous stage's SURVIVORS, and the handoff rides
the stages' own exactly-once artifacts — the dup-log generation
(gate), the accepted generation (decontam) — never an ad-hoc side
channel, so a Structured Streaming replay of the last batch is a no-op
at EVERY stage (each stage re-derives the same artifact and the
LSN-guarded upserts no-op; the monotone diversity fold recomputes the
identical selection).

Stage kinds:

* ``GateStage`` — any `streaming/gate.GatedIndexMixin` gate
  (text/embedding/media): runs the gate, then anti-joins the batch's
  dup-log generation out of the batch; rejected docs never reach later
  stages.
* ``DecontamStage`` — a `streaming/decontam.DecontamGate`: runs the
  gate, hands on the ACCEPTED generation it just wrote (re-read from
  the artifact, not recomputed — the artifact IS the contract).
* ``DiversityStage`` — a `streaming/diversity.DiversitySampleSink`
  fold over the stage input's (id, vector) projection; terminal by
  nature (its state is the selection, not a survivor stream) but the
  full stage input passes through unchanged so a sink stage can
  follow.

Per-stage wall time is recorded through `streaming/phases` under
``ChainedGateSink`` (one key per stage name), so a bench regression in
the composed path names its stage without a profiling session.

Scale shape: the chain adds NOTHING to the stages' own costs — no
extra decode, no batch-sized joins beyond one anti-join per gate stage
on the (bounded) per-batch reject set; per-batch work stays
batch + collisions, the 100 TB ingest contract each stage pins alone.

Reference analog: the reference composes its ingest path declaratively
(docker/configs/kafka-connect source -> transform chain -> sink JSON,
e.g. postgresql-sink.json transforms); here the chain composes
streamed gates with exactly-once artifact handoffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class GateStage:
    """Any `GatedIndexMixin` gate as a chain stage: the batch's
    rejected docs (this batch's dup-log generation) are anti-joined
    out; survivors flow on with ALL their columns."""

    def __init__(self, name: str, gate, id_col: str):
        self.name = name
        self.gate = gate
        self.id_col = id_col

    def apply(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        self.gate(batch_df, batch_id)
        rejected = self.gate.spark.read.parquet(
            self.gate._dup_batch_dir(batch_id)
        ).select(F.col("doc").alias(self.id_col))
        return batch_df.join(rejected, self.id_col, "left_anti")


class DecontamStage:
    """A `DecontamGate` as a chain stage: survivors are the ACCEPTED
    generation the gate just wrote — read back from the artifact
    (exactly-once by overwrite-per-batch-id), never recomputed."""

    def __init__(self, name: str, gate):
        self.name = name
        self.gate = gate

    def apply(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        import os

        self.gate(batch_df, batch_id)
        return self.gate.spark.read.parquet(
            os.path.join(
                self.gate.accepted_dir, f"batch_{int(batch_id)}"
            )
        )


class DiversityStage:
    """A `DiversitySampleSink` fold over the stage input's (id, vec)
    projection; the input passes through unchanged (the selection is
    STATE, not a survivor stream)."""

    def __init__(self, name: str, sink, id_col: str, vec_col: str):
        self.name = name
        self.sink = sink
        self.id_col = id_col
        self.vec_col = vec_col

    def apply(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        self.sink(
            batch_df.select(self.id_col, self.vec_col), batch_id
        )
        return batch_df


class ChainedGateSink:
    """foreachBatch callable running each configured stage in order,
    handing each stage the previous stage's survivors. Use directly in
    ``writeStream.foreachBatch(chain)`` or per-invocation from the
    `pipeline` CLI. ``last_batch`` holds the final stage's survivor
    count per run (observability; the per-stage walls land in
    `streaming/phases` under ``ChainedGateSink``)."""

    _GATE_NAME = "ChainedGateSink"

    def __init__(self, spark: SparkSession, stages: list):
        if not stages:
            raise ValueError("ChainedGateSink needs at least one stage")
        names = [s.name for s in stages]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stage names: {names}")
        self.spark = spark
        self.stages = list(stages)
        self.last_batch: dict = {}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from sqlserver_pg_cdc_spark.streaming import phases

        rec = phases.PhaseRecorder()
        cur = batch_df
        counts = {}
        for st in self.stages:
            cur = st.apply(cur, batch_id)
            # count() is the honest phase boundary: it executes the
            # stage's handoff artifact read so wall time lands on the
            # stage that did the work, and the materialized frame is
            # what the next stage consumes
            counts[st.name] = cur.count()
            rec.mark(st.name)
        phases.record(self._GATE_NAME, rec.ph)
        self.last_batch = {
            "batch_id": int(batch_id), "survivors": counts,
        }
