"""LM scoring, TF-IDF, BPE pair counting, k-anonymity, and time-series
gap fill: planted-frame semantics plus the cross-engine invariants the
contract queries rely on (fixed-point logs, deterministic ranking,
carried-not-recomputed values)."""

import math

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.operators import lm as LM
from sqlserver_pg_cdc_spark.operators.quality import k_anonymity
from sqlserver_pg_cdc_spark.operators.temporal import gap_fill

FP = 1_000_000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat"),
            (3, "dog runs fast"),
            (4, "zz"),  # 1 token -> no bigrams
            (5, ""),  # empty -> no tokens
        ],
        "doc_id long, text string",
    )


# --- lm_score -------------------------------------------------------------


def test_lm_score_seen_bigram_exact(spark, docs):
    """Train == score on doc 1 only: every bigram is seen, so each
    contributes floor(1e6*ln(C(g)/C(w1)))."""
    one = docs.filter("doc_id = 1")
    out = LM.lm_score(one, one, "doc_id", "text").collect()[0]
    # bigrams: "the cat","cat sat","sat on","on the","the mat" (each c=1)
    # C(the)=2, others 1 -> logs: ln(1/2), ln(1), ln(1), ln(1), ln(1/2)
    expected = (
        2 * math.floor(FP * math.log(0.5)) + 3 * math.floor(FP * math.log(1.0))
    ) / (5 * FP)
    assert out["n_bigrams"] == 5
    assert out["avg_logprob"] == pytest.approx(expected, abs=0)


def test_lm_score_backoff_and_degenerate_docs(spark, docs):
    train = docs.filter("doc_id in (1, 2)")
    out = {
        r["doc_id"]: r
        for r in LM.lm_score(train, docs, "doc_id", "text").collect()
    }
    assert len(out) == 5  # every scored doc appears
    # doc 3 is fully OOV -> pure backoff, finite and negative
    assert out[3]["n_bigrams"] == 2
    assert out[3]["avg_logprob"] < math.log(0.4)
    # degenerate docs: no bigrams, NULL score
    for d in (4, 5):
        assert out[d]["n_bigrams"] == 0
        assert out[d]["avg_logprob"] is None
    # fluent in-domain text scores higher than OOV text
    assert out[2]["avg_logprob"] > out[3]["avg_logprob"]


# --- tfidf ----------------------------------------------------------------


def test_tfidf_ranking_and_scores(spark, docs):
    out = LM.tfidf_top_terms(docs, "doc_id", "text", top_k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    # doc 3's terms are unique to it (df=1, n_docs=5): idf = ln(5)
    r1 = rows[(3, 1)]
    assert r1["term"] == "dog"  # all scores tie -> alphabetical tiebreak
    assert r1["score"] == pytest.approx(math.floor(FP * math.log(5.0)) / FP, abs=0)
    # "the" (df=2) outscores nothing in doc 1 vs unique terms ("mat" df=1)
    d1 = [rows[(1, k)]["term"] for k in (1, 2)]
    assert d1[0] == "the"  # tf=2 * ln(5/2) = 1.83 > 1*ln(5) = 1.61
    # ranks are dense 1..k and no doc exceeds k
    assert all(r["rank"] in (1, 2) for r in out.collect())


# --- bpe ------------------------------------------------------------------


def test_bpe_pair_counts(spark):
    d = spark.createDataFrame(
        [(1, "aa aa ab"), (2, "aa x")],  # 'x' has no pairs
        "doc_id long, text string",
    )
    out = {r["pair"]: r for r in LM.bpe_pair_counts(d, "text", top_k=10).collect()}
    # 'aa' word occurs 3x, 'ab' once -> pair 'aa' total 3, 'ab' total 1
    assert out["aa"]["total_count"] == 3 and out["aa"]["n_words"] == 1
    assert out["ab"]["total_count"] == 1
    assert out["aa"]["rank"] == 1
    assert "x" not in out  # single-char words contribute no pairs


# --- k-anonymity ----------------------------------------------------------


def test_k_anonymity_histogram(spark):
    d = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)],
        "id long, qi string",
    )
    out = {r["class_size"]: r for r in k_anonymity(d, ["qi"]).collect()}
    assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 2
    # 'b' and the NULL class are both singletons (NULLs group together)
    assert out[1]["n_classes"] == 2 and out[1]["n_rows"] == 2
    assert out[1]["re_id_risk"] == 1.0
    # the dataset's k is the min class size
    assert min(out) == 1


# --- gap fill -------------------------------------------------------------


def test_gap_fill_locf_and_flags(spark):
    d = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 100, 1.0),
            (1, "2024-01-01 00:50:00", 101, 2.0),  # same bucket, later -> wins
            (1, "2024-01-01 03:30:00", 102, 9.0),  # hours 1-2 are gaps
            (2, "2024-01-01 05:00:00", 103, 7.0),  # single-point key
        ],
        "user_id long, ts string, event_id long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = gap_fill(d, "user_id", "ts", "value", "event_id", "hour").collect()
    rows = {(r["user_id"], str(r["bucket_ts"])): r for r in out}
    assert len(out) == 5  # user 1: hours 0..3; user 2: hour 5
    h0 = rows[(1, "2024-01-01 00:00:00")]
    assert h0["value_filled"] == 2.0 and not h0["is_gap"]  # last-in-bucket
    for h in ("01", "02"):
        r = rows[(1, f"2024-01-01 {h}:00:00")]
        assert r["is_gap"] and r["value_filled"] == 2.0  # carried forward
    assert rows[(1, "2024-01-01 03:00:00")]["value_filled"] == 9.0
    assert not rows[(2, "2024-01-01 05:00:00")]["is_gap"]


def test_gap_fill_tiebreak_deterministic(spark):
    # two events with IDENTICAL timestamps: higher event_id wins
    d = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5, 1.0), (1, "2024-01-01 00:00:00", 6, 2.0)],
        "user_id long, ts string, event_id long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = gap_fill(d, "user_id", "ts", "value", "event_id", "hour").collect()
    assert len(out) == 1 and out[0]["value_filled"] == 2.0


# --- iterative BPE training ----------------------------------------------


def _python_bpe(texts, n_merges):
    """Reference BPE: leftmost-first non-overlapping merges, ties by
    (a, b) ascending."""
    vocab = {}
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + vocab[w]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        a, b = best
        for w, syms in segs.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            segs[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = LM.bpe_train(df, "text", n_merges=6)
    want = _python_bpe(texts, 6)
    assert got == want
    # merged symbols become multi-char: later merges build on earlier
    assert any(len(a) > 1 or len(b) > 1 for a, b in got[1:])


def test_bpe_encode_roundtrip_with_trained_merges(spark):
    texts = ["low lower lowest low low", "new newer newest new"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = LM.bpe_train(df, "text", n_merges=5)
    enc = LM.bpe_encode(df, "text", merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    for i, t in enumerate(texts):
        toks = rows[i]["bpe_tokens"]
        # concatenation reconstructs the original words exactly
        assert "".join(toks) == t.replace(" ", "")
        assert rows[i]["bpe_tokens_count"] == len(toks)
    # merges actually compress: fewer symbols than characters
    n_chars = sum(len(w) for t in texts for w in t.split())
    assert sum(r["bpe_tokens_count"] for r in rows.values()) < n_chars
