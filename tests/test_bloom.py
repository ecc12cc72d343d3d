"""Bloom membership sketch: no false negatives, merge law, FP sanity."""

import pyspark.sql.functions as F
import pytest

from sqlserver_pg_cdc_spark.operators import bloom as BL
from tests.conftest import load


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, "documents").select("doc_id", "text")


def test_no_false_negatives(spark, docs):
    """Every sketched document must probe maybe_present = true."""
    sketch = BL.bloom_build(docs, "text").persist()
    probed = BL.bloom_probe(docs, "doc_id", "text", sketch)
    n_docs = docs.count()
    n_true = probed.filter(F.col("maybe_present")).count()
    sketch.unpersist()
    assert n_true == n_docs


def test_planted_copy_detected_and_fp_rate_bounded(spark, docs):
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    sketch = BL.bloom_build(corpus, "text").persist()
    # exact copies under fresh ids MUST hit; held-out docs mostly miss
    copies = corpus.limit(5).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    )
    held_out = docs.filter(F.col("doc_id") % 5 == 0)
    hits = BL.bloom_probe(copies, "doc_id", "text", sketch)
    assert hits.filter(~F.col("maybe_present")).count() == 0
    probed = BL.bloom_probe(held_out, "doc_id", "text", sketch)
    n = probed.count()
    fp = probed.filter(F.col("maybe_present")).count()
    sketch.unpersist()
    # 1024 words x 62 bits, k=5, n<=500 at test scale -> theoretical FP
    # well under 1e-4; allow a loose 5% bound for tiny-sample noise
    assert fp / max(n, 1) < 0.05


def test_merge_equals_union_sketch(spark, docs):
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 != 0)
    merged = BL.bloom_merge(
        BL.bloom_build(a, "text"), BL.bloom_build(b, "text")
    )
    whole = BL.bloom_build(docs, "text")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_sql_twin_matches(spark, duck, docs):
    spark_rows = {
        (r["word_idx"], r["word"])
        for r in BL.bloom_build(docs, "text").collect()
    }
    duck_rows = set(
        map(
            tuple,
            duck.execute(
                BL.bloom_build_sql("SELECT * FROM documents", "text")
            ).fetchall(),
        )
    )
    assert spark_rows == duck_rows


def test_hash_family_never_degenerates_to_one_probe(spark):
    """b is forced odd (b | 1): a fingerprint whose raw second-half step
    is ≡ 0 (mod m) must still yield k DISTINCT probe positions — the
    unfixed double-hash family collapsed every probe to `a % m`."""
    # n_words=1 → m=62; raw b = 0x3e = 62 ≡ 0 (mod 62); a = 5
    fp = "000000000005" + "00000000003e" + "00000000"
    row = spark.range(1).select(
        F.array(*BL._positions(F.lit(fp), n_words=1, k=5)).alias("pos")
    ).collect()[0]
    assert len(set(row["pos"])) == 5, row["pos"]
