"""Corpus-preparation operators: segment-level dedup, context-window
chunking, score-aware canonical selection, deterministic training order.
Semantics on planted frames plus cross-engine oracle parity."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators import corpus as CO
from sqlserver_pg_cdc_spark.operators import dedup as DD
from sqlserver_pg_cdc_spark.operators.sampling import (
    training_order,
    training_order_sql,
)


# --- segment dedup --------------------------------------------------------

BOILER = "alpha beta gamma delta"  # a 4-token segment shared across docs


@pytest.fixture(scope="module")
def seg_docs(spark):
    # seg_tokens=4: doc 1 and 2 share the BOILER segment at segment
    # position 0; doc 3 is unique; doc 4 is empty; doc 5 is a ragged
    # tail (6 tokens -> one full + one 2-token segment).
    return spark.createDataFrame(
        [
            (1, BOILER + " one two three four"),
            (2, BOILER + " five six seven eight"),
            (3, "unique content entirely here now honestly"),
            (4, ""),
            (5, BOILER + " tail bit"),
        ],
        "doc_id long, text string",
    )


def test_segment_dedup_removes_shared_segments(spark, seg_docs):
    out = {
        r["doc_id"]: r
        for r in CO.segment_dedup(
            seg_docs, "doc_id", "text", seg_tokens=4, min_docs=2
        ).collect()
    }
    assert len(out) == 5  # every input doc present, even the empty one
    # the shared leading segment is stripped, the unique tail kept
    assert out[1]["clean_text"] == "one two three four"
    assert out[2]["clean_text"] == "five six seven eight"
    assert out[1]["n_segments"] == 2 and out[1]["n_removed"] == 1
    # unique doc untouched (6 tokens -> 2 segments, 0 removed)
    assert out[3]["clean_text"] == "unique content entirely here now honestly"
    assert out[3]["n_removed"] == 0
    # empty doc: no segments at all
    assert out[4]["clean_text"] == "" and out[4]["n_segments"] == 0
    # ragged doc keeps only its short tail segment
    assert out[5]["clean_text"] == "tail bit"
    assert out[5]["n_segments"] == 2 and out[5]["n_removed"] == 1


def test_segment_dedup_min_docs_threshold(spark, seg_docs):
    # min_docs=4: the BOILER segment appears in only 3 docs -> kept
    out = {
        r["doc_id"]: r
        for r in CO.segment_dedup(
            seg_docs, "doc_id", "text", seg_tokens=4, min_docs=4
        ).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"].startswith(BOILER)


def test_segment_dedup_oracle_parity(spark, duck, seg_docs):
    duck.register("seg_docs", seg_docs.toPandas())
    got = sorted(
        (r["doc_id"], r["clean_text"], r["n_segments"], r["n_removed"])
        for r in CO.segment_dedup(
            seg_docs, "doc_id", "text", seg_tokens=4, min_docs=2
        ).collect()
    )
    want = sorted(
        duck.execute(
            CO.segment_dedup_sql("seg_docs", "doc_id", "text", 4, 2)
        ).fetchall()
    )
    assert got == [tuple(w) for w in want]
    duck.unregister("seg_docs")


# --- chunking -------------------------------------------------------------

def test_chunk_documents_shapes(spark):
    # 10 tokens, chunk 4, overlap 2 -> stride 2 -> starts 0,2,4,6 (start
    # 6 covers tokens 7..10); short doc -> one chunk; empty -> none.
    docs = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
            (2, "a b"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = CO.chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=2)
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    )
    assert rows == [
        (1, 0, 4, "t1 t2 t3 t4"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t5 t6 t7 t8"),
        (1, 3, 4, "t7 t8 t9 t10"),
        (2, 0, 2, "a b"),
    ]


def test_chunk_documents_covers_every_token(spark):
    # property: the union of chunk spans covers all tokens, and every
    # chunk except possibly the last has exactly chunk_tokens tokens
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i))) for i in range(1, 40)],
        "doc_id long, text string",
    )
    out = CO.chunk_documents(docs, "doc_id", "text", chunk_tokens=7, overlap=3)
    for r in out.groupBy("doc_id").agg(
        F.max(F.col("chunk_id") * 4 + F.col("n_tokens")).alias("cover"),
        F.count(F.lit(1)).alias("n_chunks"),
    ).join(
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n")), "doc_id"
    ).collect():
        assert r["cover"] == r["n"]  # last chunk ends exactly at the doc end


def test_chunk_documents_oracle_parity(spark, duck):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 23))) for i in range(60)],
        "doc_id long, text string",
    )
    duck.register("chunk_docs", docs.toPandas())
    got = sorted(
        tuple(r) for r in CO.chunk_documents(
            docs, "doc_id", "text", chunk_tokens=8, overlap=3
        ).collect()
    )
    want = sorted(
        tuple(w)
        for w in duck.execute(
            CO.chunk_documents_sql("chunk_docs", "doc_id", "text", 8, 3)
        ).fetchall()
    )
    assert got == want
    duck.unregister("chunk_docs")


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CO.chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        CO.chunk_documents_sql("t", "doc_id", "text", 4, 5)


# --- canonical selection --------------------------------------------------

def test_select_canonical_prefers_score(spark):
    # docs 1/2/3 share a fingerprint (case+whitespace variants); the
    # external score picks doc 2; singleton doc 9 is omitted
    docs = spark.createDataFrame(
        [
            (1, "Hello World", 5.0),
            (2, "  hello   world ", 9.0),
            (3, "HELLO WORLD", 7.0),
            (9, "something else", 100.0),
        ],
        "doc_id long, text string, score double",
    )
    out = DD.select_canonical(docs, "doc_id", "text", score_col="score")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert [d for d, r in rows.items() if r["keep"]] == [2]
    # prefer='min' flips the winner
    out_min = DD.select_canonical(
        docs, "doc_id", "text", score_col="score", prefer="min"
    )
    assert [r["doc_id"] for r in out_min.collect() if r["keep"]] == [1]


def test_select_canonical_tie_breaks_on_id(spark):
    docs = spark.createDataFrame(
        [(7, "same text", 1.0), (4, "same  TEXT", 1.0)],
        "doc_id long, text string, score double",
    )
    out = DD.select_canonical(docs, "doc_id", "text", score_col="score")
    keeps = [r["doc_id"] for r in out.collect() if r["keep"]]
    assert keeps == [4]


def test_select_canonical_default_quality_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox. it jumped!", None)],
        "doc_id long, text string, score double",
    )
    # default heuristic path builds without error (no dup groups -> empty)
    assert DD.select_canonical(docs, "doc_id", "text").count() == 0
    with pytest.raises(ValueError):
        DD.select_canonical(docs, "doc_id", "text", prefer="median")
    with pytest.raises(ValueError):
        DD.select_canonical_sql("t", "doc_id", "text", prefer="best")


# --- deterministic training order ----------------------------------------

def test_training_order_deterministic_and_dense(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    a = training_order(docs, "doc_id", n_shards=8, seed="ep0").collect()
    b = training_order(
        docs.repartition(13), "doc_id", n_shards=8, seed="ep0"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partitioning-stable
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["position"])
    assert set(by_shard) == set(range(8))  # every shard populated
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))  # dense


def test_training_order_seed_changes_order(spark):
    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r["doc_id"]: (r["shard"], r["position"])
         for r in training_order(docs, "doc_id", 4, seed="ep0").collect()}
    b = {r["doc_id"]: (r["shard"], r["position"])
         for r in training_order(docs, "doc_id", 4, seed="ep1").collect()}
    assert a != b  # a new seed is a new epoch order


def test_training_order_oracle_parity(spark, duck):
    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    duck.register("ord_docs", docs.toPandas())
    got = sorted(
        tuple(r) for r in training_order(docs, "doc_id", 8, seed="x").collect()
    )
    want = sorted(
        tuple(w)
        for w in duck.execute(
            training_order_sql("ord_docs", "doc_id", 8, seed="x")
        ).fetchall()
    )
    assert got == want
    duck.unregister("ord_docs")


# --- exact-substring duplicate spans (Lee et al. shape) -------------------


def _span_docs(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 toks
    rows = [
        (1, f"one two three {shared} tail1 tail2"),
        (2, f"{shared} completely different ending here now"),
        (3, "entirely unique document with no repeated passage at all ok"),
        (4, "short doc"),
        # within-doc repetition only (no window shared with ANY other
        # doc): must NOT flag — min_docs counts distinct documents
        (5, "pn qn rn sn tn un vn wn xn yn filler pn qn rn sn tn un vn wn xn yn"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_finds_passages_at_any_alignment(spark):
    from sqlserver_pg_cdc_spark.operators.corpus import duplicate_spans

    spans = duplicate_spans(_span_docs(spark), "doc_id", "text", k=8, min_docs=2)
    got: dict = {}
    for r in spans.collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["span_start"], r["span_end"], r["n_windows"])
        )
    # doc1: shared passage at token offset 3..13 (10 tokens, 3 windows of 8)
    assert got[1] == {(3, 13, 3)}
    # doc2: same passage at offset 0 — different alignment, still found
    assert got[2] == {(0, 10, 3)}
    assert 3 not in got and 4 not in got
    assert 5 not in got  # within-doc repeats alone don't cross min_docs


def test_duplicate_spans_merges_overlapping_windows_maximally(spark):
    from sqlserver_pg_cdc_spark.operators.corpus import duplicate_spans

    # two docs sharing one LONG passage: every window inside is common,
    # so the island merge must yield ONE maximal span per doc, not many
    long = " ".join(f"w{i}" for i in range(30))
    d = spark.createDataFrame(
        [(1, f"preamble {long} postamble"), (2, f"{long} coda")],
        "doc_id long, text string",
    )
    spans = duplicate_spans(d, "doc_id", "text", k=8, min_docs=2)
    rows = spans.collect()
    assert len(rows) == 2
    m = {r["doc_id"]: (r["span_start"], r["span_end"]) for r in rows}
    assert m[1] == (1, 31) and m[2] == (0, 30)


def test_strip_duplicate_spans_removes_exactly_the_spans(spark):
    from sqlserver_pg_cdc_spark.operators.corpus import (
        duplicate_spans,
        strip_duplicate_spans,
    )

    docs = _span_docs(spark)
    spans = duplicate_spans(docs, "doc_id", "text", k=8, min_docs=2)
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, spans, "doc_id", "text").collect()}
    assert out[1]["clean_text"] == "one two three tail1 tail2"
    assert out[1]["n_removed"] == 10
    assert out[2]["clean_text"] == "completely different ending here now"
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"].startswith("entirely unique")
    assert out[4]["clean_text"] == "short doc"


def test_duplicate_spans_matches_duckdb_oracle(spark, duck):
    from sqlserver_pg_cdc_spark.operators.corpus import (
        duplicate_spans,
        duplicate_spans_sql,
    )

    docs = _span_docs(spark)
    # session-scoped duck connection: never shadow the fixture views
    # (registering as "documents" would break every later oracle test)
    duck.register("span_docs_frame", docs.toPandas())
    try:
        want = {
            tuple(r)
            for r in duck.execute(
                duplicate_spans_sql("span_docs_frame", "doc_id", "text", k=8, min_docs=2)
            ).fetchall()
        }
    finally:
        duck.unregister("span_docs_frame")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(docs, "doc_id", "text", k=8, min_docs=2).collect()
    }
    assert got == want
