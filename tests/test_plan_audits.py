"""Physical-plan audits for the analytics contract queries: the plans
must keep the shapes that scale — dimension joins broadcast, filters
pushed to the scans, no accidental cartesian products, no Python in the
hot path. Guards against regressions Catalyst won't warn about."""

import pytest

from sqlserver_pg_cdc_spark import workload
from sqlserver_pg_cdc_spark.plans.advisor import analyze_plan

SF = "/root/testdata/sf0.001"


def _metrics(spark, qname):
    fn = workload.build_catalog(spark)[qname].fn
    return analyze_plan(fn(spark, SF))


@pytest.mark.parametrize(
    "qname",
    [
        "promo_revenue_ratio",
        "volume_shipping",
        "large_volume_customers",
        "cheapest_supplier_per_part",
        "brand_supplier_stats",
        "shipping_priority",
        "local_supplier_volume",
        "nation_market_share",
        "product_type_profit",
        "returned_item_revenue",
    ],
)
def test_dim_joins_broadcast_no_cartesian(spark, qname):
    m = _metrics(spark, qname)
    assert not m.has_cartesian, m.joins
    assert any("BroadcastHashJoin" in j for j in m.joins), m.joins
    assert m.python_evals == 0


@pytest.mark.parametrize(
    "qname,expected_pushdown",
    [
        ("shipping_priority", True),   # date/segment filters reach the scans
        ("cheapest_supplier_per_part", True),  # p_size >= 45 reaches part scan
        ("rich_inactive_customers", True),     # o_orderdate filter pushes
    ],
)
def test_filters_reach_the_scan(spark, qname, expected_pushdown):
    m = _metrics(spark, qname)
    assert (m.pushed_filters > 0) == expected_pushdown, m.scans


def test_priority_class_single_shuffle_agg(spark):
    """The conditional-count aggregation must be one shuffle on the
    group key (partial aggregation map-side), not one per count."""
    m = _metrics(spark, "priority_class_counts")
    # join exchange(s) + ONE aggregate exchange; anything beyond means
    # the count_ifs stopped combining map-side
    assert m.exchanges <= 3, m.exchanges
    assert m.python_evals == 0


@pytest.mark.parametrize(
    "qname",
    ["customer_order_distribution", "dominant_part_suppliers", "important_part_value",
     "top_supplier_revenue"],
)
def test_multi_level_aggregates_stay_jvm_side(spark, qname):
    """Two-level aggregations (and 1-row broadcast threshold attaches)
    must not fall back to Python evals or true cartesian products — the
    broadcast nested-loop attach of a single-row aggregate is expected
    and cheap, a CartesianProduct node is not."""
    m = _metrics(spark, qname)
    assert not m.has_shuffle_cartesian, m.joins
    assert m.python_evals == 0


def test_pricing_summary_is_scan_plus_one_exchange(spark):
    """TPC-H Q1 shape: scan -> partial agg -> single exchange -> final
    agg, fully codegen'd."""
    m = _metrics(spark, "pricing_summary")
    assert m.exchanges == 1, m.exchanges
    # (codegen ids are absent from a pre-execution AQE formatted plan,
    # so whole-stage coverage can't be asserted here)
    assert m.pushed_filters >= 1  # shipdate predicate reaches parquet
    assert m.unfiltered_scans == 0
    assert len(m.scans) == 1  # single pass over lineitem


def test_profile_table_no_expand(spark):
    """profile_table must never trigger the multi-distinct Expand
    rewrite (xN_cols row multiplication). Approx mode: the whole
    profile is ONE aggregation pass with zero Expand; exact mode: each
    per-column countDistinct job is a lone distinct (two-level hash
    agg, no Expand either)."""
    from pyspark.sql import functions as F

    from sqlserver_pg_cdc_spark.sources.parquet import load_table

    df = load_table(spark, SF, "customer")
    aggs = []
    for i, f in enumerate(df.schema.fields):
        c = F.col(f.name)
        aggs += [
            F.count_if(c.isNull()).alias(f"n{i}"),
            F.approx_count_distinct(c).alias(f"d{i}"),
            F.min(c).alias(f"mn{i}"),
            F.max(c).alias(f"mx{i}"),
        ]
    approx_plan = df.agg(*aggs)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Expand" not in approx_plan, "approx profile plan grew an Expand"
    lone = (
        df.select("c_mktsegment")
        .agg(F.countDistinct("c_mktsegment"))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert "Expand" not in lone, "lone countDistinct plan grew an Expand"


@pytest.mark.parametrize("qname", ["corpus_boilerplate", "decontaminate"])
def test_gram_joins_not_hint_forced_broadcast(spark, qname):
    """The boilerplate / eval gram sets are unbounded at corpus scale,
    so the queries must not FORCE a broadcast via hint. (Catalyst and
    AQE may still choose broadcast from observed sizes at test scale —
    that is the correct size-based behavior and would not fire at
    100 TB; a hint would.) Asserted on the analyzed logical plan, where
    F.broadcast leaves a ResolvedHint node."""
    fn = workload.build_catalog(spark)[qname].fn
    logical = str(fn(spark, SF)._jdf.queryExecution().analyzed())
    assert "ResolvedHint" not in logical, "gram-side broadcast is hint-forced"
    m = _metrics(spark, qname)
    assert m.python_evals == 0
    assert not m.has_cartesian


@pytest.mark.parametrize(
    "qname",
    ["corpus_lm_score", "tfidf_top_terms", "events_gap_fill", "events_json_stats"],
)
def test_new_pipeline_queries_stay_jvm_distributed(spark, qname):
    """LM scoring / TF-IDF gram-and-term tables are vocabulary-bounded
    but still unbounded sets — no hint-forced broadcasts; no Python in
    the hot path; no cartesian products anywhere in the family."""
    fn = workload.build_catalog(spark)[qname].fn
    logical = str(fn(spark, SF)._jdf.queryExecution().analyzed())
    m = _metrics(spark, qname)
    assert m.python_evals == 0
    if qname in ("corpus_lm_score", "tfidf_top_terms"):
        # ONE cross join is by design: the one-row broadcast totals
        # frame (N tokens / vocab size / doc count). Nothing else may
        # go cartesian, and no other hint-forced broadcast exists.
        crosses = [j for j in m.joins if "Cross" in j]
        assert len(crosses) <= 1, m.joins
        assert all("BroadcastNestedLoopJoin" in j for j in crosses), m.joins
        assert logical.count("ResolvedHint") <= 1
    else:
        assert not m.has_cartesian, m.joins


def test_ivf_assignment_has_no_centroid_blowup(spark):
    """The IVF cell assignment must be per-row expression work — the
    old form cross-joined every vector against the centroid table and
    re-windowed, amplifying the corpus k-fold through an exchange."""
    from pyspark.sql import functions as F

    from sqlserver_pg_cdc_spark.operators.similarity import with_ivf_cell
    from sqlserver_pg_cdc_spark.sources.parquet import load_table

    emb = load_table(spark, SF, "embeddings")
    assigned, _ = with_ivf_cell(emb, "vec_id", "embedding", n_cells=4)
    plan = assigned._sc is not None and str(
        assigned._jdf.queryExecution().executedPlan()
    )
    assert "Window" not in plan, "assignment still windows per vector"
    m = analyze_plan(assigned)
    assert m.exchanges == 0, "assignment should ride the scan"


def test_bpe_topk_is_take_ordered(spark):
    """bpe_top_pairs must plan the global top-k as TakeOrderedAndProject,
    not a single-partition global window over the whole pair table."""
    fn = workload.build_catalog(spark)["bpe_top_pairs"].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize(
    "qname",
    [
        "fuzzy_match_customers",
        "diff_orders_incremental",
        "order_outliers",
        "user_series_correlation",
        "semantic_decontam",
        "events_continuous_agg",
    ],
)
def test_round3_queries_no_cartesian_no_python(spark, qname):
    """The blocked/banded/bucketed round-3 plans must never fall back to
    a cartesian product or row-at-a-time Python."""
    m = _metrics(spark, qname)
    assert m.python_evals == 0
    assert not m.has_cartesian, m.joins


def test_every_catalog_query_has_an_oracle(spark):
    """The full-oracle guarantee: every contract query ships a DuckDB
    SQL twin (no rows-only checks). A None oracle here would silently
    downgrade the driver's correctness gate for that query."""
    cat = workload.build_catalog(spark)
    missing = [n for n, spec in cat.items() if spec.oracle is None]
    assert not missing, missing
    assert len(cat) >= 105


def test_part_pair_topk_is_take_ordered(spark):
    """The market-basket top-20 must plan as TakeOrderedAndProject (no
    global sort materialization of the pair-count table)."""
    fn = workload.build_catalog(spark)["part_pair_cooccurrence"].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize(
    "qname",
    ["heavy_hitter_tokens", "part_pair_cooccurrence", "latest_per_key_skewed"],
)
def test_round5_queries_no_cartesian_no_python(spark, qname):
    m = _metrics(spark, qname)
    assert m.python_evals == 0
    assert not m.has_cartesian, m.joins


def test_cms_estimate_broadcasts_the_sketch(spark):
    """The sketch side is <= d*w rows by construction — candidate
    estimation must broadcast it, never shuffle the candidate frame."""
    m = _metrics(spark, "heavy_hitter_tokens")
    assert any("BroadcastHashJoin" in j for j in m.joins), m.joins


def test_incremental_checksum_filter_reaches_the_scan(spark):
    """The 10-100x incremental-checksum claim rests on the delta
    predicate reaching the parquet scan (row-group pruning at scale) —
    assert PushedFilters is non-empty and no Python touches the path."""
    from sqlserver_pg_cdc_spark.operators.checksum import incremental_checksum
    from sqlserver_pg_cdc_spark.sources.parquet import load_table

    li = load_table(spark, SF, "lineitem")
    m = analyze_plan(incremental_checksum(li, "l_shipdate", "2001-10-11"))
    assert m.pushed_filters > 0, m.scans
    assert m.python_evals == 0


def test_sole_late_supplier_has_no_expand(spark):
    """The Q21 re-plan replaced the double countDistinct with window
    counts over a dedup aggregate — the Expand row-duplication operator
    must not reappear."""
    fn = workload.build_catalog(spark)["sole_late_supplier"].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert "Expand" not in plan, plan


def test_latest_per_key_skewed_is_two_phase(spark):
    """The salted hot-key reduction must plan as two aggregate levels
    (per-salt partial, then per-key merge), not a single window."""
    fn = workload.build_catalog(spark)["latest_per_key_skewed"].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert plan.count("max_by") >= 2, plan
    assert "Window" not in plan, plan


@pytest.mark.parametrize(
    "qname",
    ["embedding_streamed_index", "multimodal_flac_frames"],
)
def test_round6_queries_no_cartesian(spark, qname):
    """Round-6 additions: the streamed-index probe must stay a banded
    equi-join (no cartesian), and the FLAC contract plan must contain
    exactly the two deliberate Python stages (encode harness + decode
    operator) and nothing else."""
    m = _metrics(spark, qname)
    assert not m.has_cartesian, m.joins
    if qname == "multimodal_flac_frames":
        assert m.python_evals <= 2


def test_codec_queries_fan_out_before_python(spark):
    """The codec mapInPandas stages must sit behind a repartition —
    documents reads as one split at bench scale, and without the
    exchange the whole Python decode serializes on a single task."""
    for qname in ("multimodal_flac_frames", "multimodal_jpeg_decode",
                  "multimodal_resize_jpeg", "multimodal_avi_frames"):
        fn = workload.build_catalog(spark)[qname].fn
        plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
        i_ex = plan.find("Exchange RoundRobinPartitioning(32")
        i_py = plan.find("MapInPandas")
        assert i_ex != -1, qname
        assert i_py != -1, qname


@pytest.mark.parametrize(
    "qname",
    ["forecast_revenue_change", "supplier_part_variety", "promo_part_suppliers",
     "duplicate_spans"],
)
def test_round6_tpch_and_spans_no_cartesian_no_python(spark, qname):
    m = _metrics(spark, qname)
    assert m.python_evals == 0
    assert not m.has_cartesian, m.joins


def test_forecast_revenue_filters_reach_the_scan(spark):
    """Q6 is THE pushdown query: the date range must reach the parquet
    scan as pushed filters."""
    m = _metrics(spark, "forecast_revenue_change")
    assert m.pushed_filters > 0, m.scans


def test_duplicate_spans_stripped_range_rides_equi_join(spark):
    """The strip step's span-range predicate must ride the doc-keyed
    equi-join (semi-join per doc, spans-per-doc bounded) — never a
    cartesian — and the whole find->strip plan stays JVM-side."""
    m = _metrics(spark, "duplicate_spans_stripped")
    assert not m.has_cartesian, m.joins
    assert m.python_evals == 0


def test_quantile_buckets_orders_no_window_no_sort(spark):
    """The quantile-bucket scale path must stay one aggregate (sketch)
    + one windowless assignment scan — never a global-sort NTILE."""
    fn = workload.build_catalog(spark)["quantile_buckets_orders"].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert "Window" not in plan, plan
    assert "Sort" not in plan, plan
    m = _metrics(spark, "quantile_buckets_orders")
    assert m.python_evals == 0


@pytest.mark.parametrize(
    "qname",
    ["semantic_decontam_gate", "cdc_purge_retention", "scd2_prune_time_travel"],
)
def test_round9_contracts_no_cartesian_no_python(spark, qname):
    """Round-9 additions: the streaming semantic-decontam probe must
    stay a banded equi-join + exact-cosine verify (no cartesian), and
    both day-2 retention contracts read back pure JVM-side state scans
    — no Python anywhere in any of the three."""
    m = _metrics(spark, qname)
    assert not m.has_cartesian, m.joins
    assert m.python_evals == 0


def test_ivfpq_probe_scans_codes_not_vectors(spark):
    """IVF-PQ's candidate stage must join the probed cells' CODES (no
    cartesian on data — the only crossJoin is queries x k centroids,
    both tiny) and stay JVM-side end to end."""
    m = _metrics(spark, "ann_topk_ivfpq")
    assert m.python_evals == 0
    fn = workload.build_catalog(spark)["ann_topk_ivfpq"].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    # the ADC join keys on cell_id (hash or broadcast join, by size)
    assert "cell_id" in plan


@pytest.mark.parametrize(
    "qname", ["multimodal_subband_frames", "multimodal_mcv_frames"]
)
def test_round9_codec_queries_plan_shape(spark, qname):
    """The two round-9 codec contracts (psychoacoustic subband audio,
    motion-compensated video): no cartesian, exactly the two deliberate
    Python stages (encode harness + decode operator), and the
    mapInPandas chain fanned out behind the 32-way repartition."""
    m = _metrics(spark, qname)
    assert not m.has_cartesian, m.joins
    assert m.python_evals <= 2
    fn = workload.build_catalog(spark)[qname].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert plan.find("Exchange RoundRobinPartitioning(32") != -1, qname
    assert plan.find("MapInPandas") != -1, qname


@pytest.mark.parametrize(
    "qname",
    [
        "multimodal_resize_png",
        "multimodal_resize_gif",
        "multimodal_audio_resample",
        "multimodal_video_thumbnails",
        "image_phash_crossformat",
    ],
)
def test_late_round9_payload_queries_plan_shape(spark, qname):
    """The late round-9 payload contracts (PNG/GIF resize passes,
    audio resample chain, video thumbnails, cross-format pHash): no
    cartesian, the codec work fanned out behind the 32-way
    repartition, and no unexpected extra Python stages (the budget is
    encode harness + up to three chained codec operators; pHash adds
    one window for the group step, which must hash-partition on the
    fingerprint, not sort globally)."""
    m = _metrics(spark, qname)
    assert not m.has_cartesian, m.joins
    assert m.python_evals <= 4
    fn = workload.build_catalog(spark)[qname].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert plan.find("Exchange RoundRobinPartitioning(32") != -1, qname
    assert plan.find("MapInPandas") != -1, qname
    if qname == "image_phash_crossformat":
        assert "hashpartitioning(phash" in plan, plan[:2000]


def test_allbits_banding_folds_once_per_row(spark):
    """Round-10 restructure: the 8x10x64 banding computes ALL sign bits
    in ONE transform HOF over a 2-D plane literal, sliced per band with
    substring over the materialized __bits column. CollapseProject must
    NOT inline the alias back into 8 copies (that would re-run the
    5120-multiply fold per band per row) — pin exactly one transform in
    the optimized plan, for both the batch index builder and the
    streamed sink projection."""
    import tempfile

    from sqlserver_pg_cdc_spark.operators.dedup import embedding_band_index
    from sqlserver_pg_cdc_spark.streaming.ann import AnnIndexSink

    df = spark.createDataFrame(
        [(1, [float(j) for j in range(64)])],
        "vec_id long, embedding array<double>",
    )
    idx_plan = (
        embedding_band_index(df, "vec_id", "embedding")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert idx_plan.count("transform(") == 1, idx_plan
    assert "__bits" in idx_plan  # the alias survives as its own Project

    sink = AnnIndexSink(
        spark, tempfile.mkdtemp(), "vec_id", "embedding", n_partitions=4
    )
    proj_plan = (
        sink._project(df, 0)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert proj_plan.count("transform(") == 1, proj_plan
    assert "__bits" in proj_plan


def test_media_gate_query_plan_shape(spark):
    """The media gate contract stays JVM-side outside the single decode
    mapInPandas pass, with no cartesian anywhere: the probe is a banded
    equi-join on (band_id, band_val) with the Hamming verify computed
    IN the join output (both fingerprints ride the band frames)."""
    m = _metrics(spark, "media_dedup_gate")
    assert not m.has_cartesian, m.joins
    # exactly the decode passes reach Python (one mapInPandas per batch
    # projection); probe/cluster/log read back pure JVM
    fn = workload.build_catalog(spark)["media_dedup_gate"].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert "CartesianProduct" not in plan


def test_video_crossformat_plan_shape(spark):
    """video_phash_crossformat: no cartesian anywhere; the near-pair
    probe is a banded equi-join; the only Python is the two mapInPandas
    passes (payload synth + fingerprint decode) — the clustering and
    labeling read the localCheckpoint'd fingerprint frame JVM-side."""
    m = _metrics(spark, "video_phash_crossformat")
    assert not m.has_cartesian, m.joins


def test_auto_media_band_joins_are_family_scoped(spark, tmp_path):
    """media='auto': every Hamming band join must carry `family` as an
    equi-join KEY (cross-family candidates impossible by construction).
    Pinned on the plan text of the gate's probe frame."""
    from sqlserver_pg_cdc_spark.streaming.media import FingerprintIndexSink

    sink = FingerprintIndexSink(
        spark, str(tmp_path / "fpstate"), "doc_id", "payload",
        media="auto", n_partitions=4,
    )
    probe = spark.createDataFrame(
        [(1, 7, "image")], "doc long, fp long, family string"
    )
    proj = spark.createDataFrame(
        [(2, 7, "audio", 0)], "doc long, fp long, family string, lsn long"
    )
    sink._upsert_projected(proj, 0)
    res = sink._near_dups_core(probe, max_hamming=6)
    plan = str(res._jdf.queryExecution().analyzed())
    res.unpersist()
    assert "family" in plan
    # and behaviorally: same fp, different family -> no candidate
    res2 = sink._near_dups_core(probe, max_hamming=6)
    assert res2.count() == 0
    res2.unpersist()


def test_video_recut_plan_shape(spark):
    """video_phash_recut: the per-frame probe is frames x bands rows
    through the SAME banded equi-join (posexplode of the fingerprint
    arrays), one aggregation per surviving clip pair — no cartesian
    anywhere; the only Python is the two mapInPandas passes (payload
    synth + per-frame fingerprint decode)."""
    m = _metrics(spark, "video_phash_recut")
    assert not m.has_cartesian, m.joins
    fn = workload.build_catalog(spark)["video_phash_recut"].fn
    plan = str(fn(spark, SF)._jdf.queryExecution().executedPlan())
    assert "CartesianProduct" not in plan
    # the banded frame-pair join keys on (band_id, band_val) — the
    # pigeonhole equi-join, not an all-pairs frame comparison (the
    # full query's final plan reads the already-materialized component
    # iteration, so pin the pairs stage directly)
    from sqlserver_pg_cdc_spark.operators.multimodal import (
        vframe_near_clip_pairs,
    )

    frames = spark.createDataFrame(
        [(1, [3, 5]), (2, [3, 9])], "doc_id long, fhashes array<long>"
    )
    pplan = str(
        vframe_near_clip_pairs(frames, min_frames=1)
        ._jdf.queryExecution().optimizedPlan()
    )
    assert "band_val" in pplan and "posexplode" in pplan.lower()


def test_frame_granularity_band_joins_family_scoped(spark, tmp_path):
    """granularity='frame': the per-frame band join carries `family`
    as an equi-join KEY exactly like the clip path (cross-family
    candidates impossible by construction)."""
    from pyspark.sql import functions as F

    from sqlserver_pg_cdc_spark.streaming.media import FingerprintIndexSink

    sink = FingerprintIndexSink(
        spark, str(tmp_path / "vfstate"), "doc_id", "payload",
        media="video", granularity="frame", min_match_frames=1,
        n_partitions=4,
    )
    proj = spark.createDataFrame(
        [(2, [7, 9], "video", 0)],
        "doc long, fp array<long>, family string, lsn long",
    )
    sink._upsert_projected(proj, 0)
    probe = spark.createDataFrame(
        [(1, [7, 9], "video")], "doc long, fp array<long>, family string"
    )
    res = sink._near_dups_core(probe, max_hamming=6)
    plan = str(res._jdf.queryExecution().analyzed())
    res.unpersist()
    assert "family" in plan and "band_val" in plan
    res2 = sink._near_dups_core(
        probe.withColumn("family", F.lit("image")), max_hamming=6
    )
    assert res2.count() == 0  # same fp, wrong family: no candidate
    res2.unpersist()
