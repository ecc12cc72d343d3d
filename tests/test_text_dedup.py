"""Text analysis, dedup, and similarity-search tests: semantics plus
cross-engine oracle parity on the documents/embeddings fixtures."""

import pytest
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions import text as TX
from sqlserver_pg_cdc_spark.functions.vectors import cosine
from sqlserver_pg_cdc_spark.operators import dedup as DD
from sqlserver_pg_cdc_spark.operators.similarity import (
    topk_brute_force,
    topk_brute_force_sql,
    topk_lsh,
    with_lsh_bucket,
)
from tests.conftest import load


# --- text functions -------------------------------------------------------

def test_tokens_and_count(spark):
    df = spark.createDataFrame([("  The quick  fox ",), ("",), (" ",)], "t string")
    rows = df.select(
        TX.tokens("t").alias("tk"), TX.token_count("t").alias("n")
    ).collect()
    assert rows[0]["tk"] == ["the", "quick", "fox"] and rows[0]["n"] == 3
    assert rows[1]["n"] == 0 and rows[2]["n"] == 0


def test_shingles_short_text_empty(spark):
    df = spark.createDataFrame([("one two",), ("a b c d",)], "t string")
    rows = df.select(TX.shingles("t", 3).alias("sh")).collect()
    assert rows[0]["sh"] == []  # fewer tokens than k
    assert sorted(rows[1]["sh"]) == ["a b c", "b c d"]


def test_lang_id_basics(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund und die katze ist nicht da",),
            ("le chat et la maison est un jardin",),
            ("el perro y los gatos es una casa",),
            ("zzz qqq xxx",),
        ],
        "t string",
    )
    got = [r[0] for r in df.select(TX.lang_id("t")).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


@pytest.mark.parametrize(
    "expr,sql",
    [
        (TX.token_count, TX.token_count_sql),
        (TX.lang_id, TX.lang_id_sql),
        (TX.quality_score, TX.quality_score_sql),
        (TX.fingerprint, TX.fingerprint_sql),
        (TX.punct_count, TX.punct_count_sql),
        (TX.subword_count, TX.subword_count_sql),
    ],
    ids=["token_count", "lang_id", "quality", "fingerprint", "punct", "subword"],
)
def test_text_fn_oracle_parity_on_documents(spark, duck, expr, sql):
    df = load(spark, "documents")
    got = {r["doc_id"]: r["v"] for r in df.select("doc_id", expr("text").alias("v")).collect()}
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"SELECT doc_id, {sql('text')} FROM documents"
        ).fetchall()
    }
    assert got == want


# --- dedup ----------------------------------------------------------------

def _docs_with_dups(spark):
    base = load(spark, "documents")
    # plant exact dups (whitespace variants) and near-dups (token swap)
    exact = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper(F.substring("text", 1, 0)), F.col("text"), F.lit(" ")).alias("text"),
        "lang", "source", "n_chars",
    )
    near = base.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra trailing words appended here")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(exact).unionByName(near)


def test_exact_dedup_finds_planted_dups(spark):
    df = _docs_with_dups(spark)
    groups = DD.exact_dup_groups(df, "doc_id", "text").collect()
    keep = {r["keep_id"]: r["n_docs"] for r in groups}
    planted = {k for k in keep if k < 10}
    assert planted == set(range(10))
    assert all(keep[k] == 2 for k in planted)


def test_minhash_lsh_finds_near_dups(spark):
    df = _docs_with_dups(spark)
    pairs = {
        (r["a"], r["b"])
        for r in DD.minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    # exact dups must collide on every band; near dups on at least one
    exact_hits = sum((i, i + 10000) in pairs for i in range(10))
    near_hits = sum((i, i + 20000) in pairs for i in range(10, 20))
    assert exact_hits == 10
    assert near_hits >= 8  # probabilistic but heavily stacked
    # sanity: vastly fewer pairs than the cross product
    assert len(pairs) < 1000


def test_ngram_jaccard_scores(spark):
    df = _docs_with_dups(spark)
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.3, block_col="source"
        ).collect()
    }
    exact = [(i, i + 10000) for i in range(10)]
    assert all(pairs.get(p) == 1.0 for p in exact)


def test_simhash_near_dups_close(spark):
    df = _docs_with_dups(spark)
    sh = {r["doc"]: r["simhash"] for r in DD.simhash(df, "doc_id", "text").collect()}
    for i in range(10):
        assert sh[i] == sh[i + 10000]  # identical token multiset -> equal
    for i in range(10, 20):
        ham = bin(sh[i] ^ sh[i + 20000]).count("1")
        assert ham <= 12  # near-dup stays within a few bits of 60


@pytest.mark.parametrize(
    "mk,mk_sql",
    [
        (
            lambda df: DD.exact_dup_groups(df, "doc_id", "text"),
            lambda: DD.exact_dup_groups_sql("documents", "doc_id", "text"),
        ),
        (
            lambda df: DD.minhash_lsh_pairs(df, "doc_id", "text"),
            lambda: DD.minhash_lsh_pairs_sql("documents", "doc_id", "text"),
        ),
        (
            lambda df: DD.simhash(df, "doc_id", "text"),
            lambda: DD.simhash_sql("documents", "doc_id", "text"),
        ),
        (
            lambda df: DD.ngram_jaccard_pairs(
                df, "doc_id", "text", threshold=0.2, block_col="lang"
            ),
            lambda: DD.ngram_jaccard_pairs_sql(
                "documents", "doc_id", "text", threshold=0.2, block_col="lang"
            ),
        ),
    ],
    ids=["exact", "minhash_lsh", "simhash", "ngram_jaccard"],
)
def test_dedup_oracle_parity(spark, duck, mk, mk_sql):
    df = load(spark, "documents")
    got = sorted(tuple(r) for r in mk(df).collect())
    want = sorted(tuple(r) for r in duck.execute(mk_sql()).fetchall())
    assert got == want


# --- similarity search ----------------------------------------------------

def test_topk_brute_force_oracle_parity(spark, duck):
    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    got = sorted(
        tuple(r) for r in topk_brute_force(emb, q, "vec_id", "embedding", k=10).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            topk_brute_force_sql("embeddings", "vec_id", "embedding", "vec_id < 5", k=10)
        ).fetchall()
    )
    assert got == want


def test_topk_lsh_recall_vs_exact(spark):
    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect()
    approx = topk_lsh(emb, q, "vec_id", "embedding", k=5, n_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # the fixture embeddings are UNclustered (uniform random), so the
    # ceiling for any bucketing scheme is modest; the signal that LSH
    # works is recall exceeding the probed fraction of the space
    # (4 planes + Hamming-1 multiprobe scans ~5/16 = 31%)
    assert mean_recall > 0.33, f"mean recall {mean_recall} <= probed fraction"


def test_embedding_near_dup_blocked(spark):
    emb = load(spark, "embeddings")
    pairs = DD.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.8, block_col="label"
    )
    rows = pairs.collect()
    assert all(r["cosine"] >= 0.8 for r in rows)


def test_lsh_bucket_column(spark):
    emb = load(spark, "embeddings")
    b = with_lsh_bucket(emb, "embedding", n_planes=8)
    rows = b.select("lsh_bucket").distinct().collect()
    assert 1 < len(rows) <= 256
    assert all(len(r[0]) == 8 and set(r[0]) <= {"0", "1"} for r in rows)


def test_topk_ivf_matches_bruteforce_shape_and_recall(spark):
    from sqlserver_pg_cdc_spark.operators.similarity import topk_ivf

    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect()
    ivf = topk_ivf(emb, q, "vec_id", "embedding", k=5, n_cells=8, n_probe=4).collect()
    es, vs = {}, {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["id"])
    for r in ivf:
        vs.setdefault(r["query_id"], set()).add(r["id"])
    assert set(vs) == set(es)
    recalls = [len(es[k] & vs.get(k, set())) / len(es[k]) for k in es]
    mean = sum(recalls) / len(recalls)
    # probing 4/8 cells on unclustered vectors: recall must beat the
    # probed fraction
    assert mean > 0.5, f"ivf mean recall {mean}"


def test_simhash_near_pairs_finds_planted(spark):
    df = _docs_with_dups(spark)
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in DD.simhash_near_pairs(df, "doc_id", "text", max_hamming=6).collect()}
    # exact dups (identical token multiset) -> hamming 0, always found
    exact_hits = [(i, i + 10000) for i in range(10)]
    assert all(pairs.get(p) == 0 for p in exact_hits)
    # cache released after materialization
    assert all(h <= 6 for h in pairs.values())


def test_embedding_lsh_near_dup_recall_vs_exact(spark):
    """Banded hyperplane LSH (8x4) vs the unblocked all-pairs ground
    truth on the 500-vector fixture: every LSH pair must be a true pair
    (precision 1.0 — the exact cosine verifies), recall must clear the
    OR-construction bound at the near-dup threshold, and high-similarity
    pairs (cosine >= 0.9, where 1-(1-p^4)^8 > 0.999) must ALL be found."""
    emb = load(spark, "embeddings")
    truth = {
        (r["a"], r["b"]): r["cosine"]
        for r in DD.embedding_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.5, block_col=None
        ).collect()
    }
    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in DD.embedding_near_dup_lsh_pairs(
            emb, "vec_id", "embedding", threshold=0.5
        ).collect()
    }
    assert set(got) <= set(truth)  # exact verify => no false positives
    if truth:
        recall = len(got) / len(truth)
        assert recall >= 0.5, f"recall {recall:.2f} below OR-construction floor"
    hot = {p for p, c in truth.items() if c >= 0.9}
    assert hot <= set(got), "high-similarity pairs must survive banding"


def test_trained_ivf_centroids_recall(spark):
    """Spherical k-means trained in Spark (train_ivf_centroids) feeding
    topk_ivf: centroid shapes intact, every vector assigned, and recall
    at n_probe=4/8 clears the probed fraction by a wide margin.

    No trained-beats-default assertion: the fixture embeddings are
    UNIFORM random, so there is no cluster structure for k-means to
    exploit — on real (clustered) corpora trained cells win, but here
    any well-spread centroid set is near-optimal and the k-means local
    optimum can land slightly below it. Determinism comes from the fixed
    seed, so the measured recall is stable."""
    from sqlserver_pg_cdc_spark.operators.similarity import (
        topk_ivf,
        train_ivf_centroids,
        with_ivf_cell,
    )

    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cents = train_ivf_centroids(emb, "embedding", n_cells=8, max_iter=10)
    got = cents.collect()
    assert len(got) == 8
    assert all(len(r["cv"]) == 64 and r["cn"] > 0 for r in got)

    assigned, _ = with_ivf_cell(emb, "vec_id", "embedding", centroids=cents)
    assert assigned.count() == emb.count()  # total assignment, no drops

    exact = topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect()
    es = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["id"])
    trained = topk_ivf(
        emb, q, "vec_id", "embedding", k=5, n_probe=4, centroids=cents
    ).collect()
    vs = {}
    for r in trained:
        vs.setdefault(r["query_id"], set()).add(r["id"])
    recall = sum(
        len(es[qid] & vs.get(qid, set())) / len(es[qid]) for qid in es
    ) / len(es)
    assert recall >= 0.6, f"trained recall {recall} at n_probe=4/8"


def test_dup_components_chain_and_singleton_clusters(spark):
    """Label propagation must merge transitive chains into one component
    (a-b, b-c => {a,b,c}) and keep exactly one survivor per cluster."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        "a long, b long",
    )
    rows = {r["doc"]: (r["component"], r["keep"])
            for r in DD.dup_components(pairs).collect()}
    assert {d for d, (c, _) in rows.items() if c == 1} == {1, 2, 3}
    assert {d for d, (c, _) in rows.items() if c == 10} == {10, 11}
    # 5-node chain: diameter > 1 forces multiple propagation rounds
    assert {d for d, (c, _) in rows.items() if c == 20} == {20, 21, 22, 23, 24}
    keeps = {d for d, (_, k) in rows.items() if k}
    assert keeps == {1, 10, 20}


def test_dup_components_deep_chain_compression(spark):
    """A 40-node path graph has diameter 39 — plain hash-min needs ~39
    rounds, but the pointer-jumping rounds (active from round 3) double
    propagation distance, so max_iter=12 must suffice. Exercises the
    compressed-round code path end to end (driver_threshold=0 forces the
    distributed loop — tiny fixtures otherwise take the union-find fast
    path)."""
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    rows = DD.dup_components(pairs, max_iter=12, driver_threshold=0).collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}
    assert sorted(r["doc"] for r in rows if r["keep"]) == [0]


def test_dup_components_fast_path_equals_distributed(spark):
    """The size-gated driver union-find must produce exactly the
    distributed label-propagation result — components labeled by min
    member, keep on the minimum — on a graph mixing chains, stars,
    singleton pairs, and duplicate/reversed edges."""
    edges = (
        [(i, i + 1) for i in range(0, 30)]        # 31-node chain
        + [(100, j) for j in range(101, 110)]      # star
        + [(200, 201), (300, 301)]                 # islands
        + [(2, 1), (105, 100), (200, 201)]         # reversed + duplicate
    )
    pairs = spark.createDataFrame(edges, "a long, b long")
    fast = {tuple(r) for r in DD.dup_components(pairs).collect()}
    dist = {
        tuple(r)
        for r in DD.dup_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist


def test_dup_components_incremental_equals_rebuild(spark):
    """Folding new pairs into standing labels must reproduce the
    from-scratch clustering exactly: chain extension, merging two old
    components through one bridging edge, brand-new islands, and an
    intra-component no-op edge."""
    old = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "a long, b long"
    )
    labels = DD.dup_components(old)
    new = spark.createDataFrame(
        [
            (3, 4),     # extends {1,2,3} with a new node
            (11, 20),   # merges components 10 and 20
            (30, 31),   # brand-new island
            (1, 3),     # no-op: both already in component 1
        ],
        "a long, b long",
    )
    inc = sorted(
        tuple(r) for r in DD.dup_components_incremental(labels, new).collect()
    )
    full = sorted(
        tuple(r) for r in DD.dup_components(old.unionByName(new)).collect()
    )
    assert inc == full
    # the driver union-find fast path and the distributed quotient fold
    # must be indistinguishable
    dist = sorted(
        tuple(r)
        for r in DD.dup_components_incremental(
            labels, new, driver_threshold=0
        ).collect()
    )
    assert dist == full


def test_dup_components_incremental_empty_sides(spark):
    """No new pairs -> labels unchanged; no standing labels -> pure
    clustering of the new pairs."""
    old = spark.createDataFrame([(1, 2)], "a long, b long")
    labels = DD.dup_components(old)
    none = spark.createDataFrame([], "a long, b long")
    unchanged = sorted(
        tuple(r) for r in DD.dup_components_incremental(labels, none).collect()
    )
    assert unchanged == sorted(tuple(r) for r in labels.collect())
    fresh = spark.createDataFrame([(5, 6), (6, 7)], "a long, b long")
    empty_labels = labels.limit(0)
    got = sorted(
        tuple(r)
        for r in DD.dup_components_incremental(empty_labels, fresh).collect()
    )
    assert got == sorted(tuple(r) for r in DD.dup_components(fresh).collect())


def test_dup_components_oracle_parity(spark, duck):
    """Spark label propagation == DuckDB recursive-CTE closure on the
    real near-dup pair set."""
    df = load(spark, "documents")
    pairs = DD.minhash_jaccard_verified_pairs(df, "doc_id", "text", threshold=0.2)
    got = sorted(tuple(r) for r in DD.dup_components(pairs).collect())
    sql = DD.dup_components_sql(
        DD.minhash_jaccard_verified_pairs_sql("documents", "doc_id", "text", threshold=0.2)
    )
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want


def test_minhash_incremental_dedup_planted(spark):
    """A new doc near-identical to a corpus doc is caught via the
    precomputed band index; unrelated new docs are not; pairs are
    always (new, existing) — never corpus-vs-corpus."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight again"),
            (2, "completely different text about spark adaptive execution"),
            (3, "the quick brown fox jumps over the lazy dog tonight again"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight again"),
            (101, "nothing like anything in the corpus at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    index = DD.minhash_index(corpus, "doc_id", "text")
    got = DD.minhash_incremental_dedup(
        new, corpus, index, "doc_id", "text", threshold=0.5
    ).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    assert (100, 1) in pairs and (100, 3) in pairs
    assert all(a == 100 for a, _ in pairs)  # 101 clean; no old-old pairs
    assert all(r["jaccard"] == 1.0 for r in got)


def test_embedding_incremental_near_dup_planted(spark):
    """Re-ingested copies of corpus vectors are caught against the
    precomputed hyperplane band index; unrelated uniform vectors are
    not; pairs are always (new, existing)."""
    emb = load(spark, "embeddings").select("vec_id", "embedding")
    new = (
        emb.filter(F.col("vec_id") < 10)
        .withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    )
    index = DD.embedding_band_index(emb, "vec_id", "embedding")
    got = DD.embedding_incremental_near_dup(
        new, emb, index, "vec_id", "embedding", threshold=0.95
    ).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    assert {(1_000_000 + i, i) for i in range(10)} <= pairs
    assert all(a >= 1_000_000 for a, _ in pairs)  # no corpus-vs-corpus


def test_decontaminate_planted_overlap(spark):
    """A corpus doc embedding an eval doc's 3-gram is flagged; clean and
    too-short docs are not."""
    from sqlserver_pg_cdc_spark.operators.decontam import decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "somewhere a quick brown fox appeared today"),  # shares "quick brown fox"
            (2, "completely unrelated text about spark plans here"),
            (3, "too short"),  # < 3 tokens -> zero grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            decontaminate(corpus, eval_df, "doc_id", "text", k=3).collect()}
    assert rows[1]["contaminated"] and rows[1]["n_eval_hits"] >= 1
    assert not rows[2]["contaminated"] and rows[2]["n_eval_hits"] == 0
    assert rows[3]["n_grams"] == 0 and not rows[3]["contaminated"]
    assert rows[1]["contam_frac"] > 0


def test_decontaminate_oracle_parity(spark, duck):
    from sqlserver_pg_cdc_spark.operators.decontam import (
        decontaminate,
        decontaminate_sql,
    )

    d = load(spark, "documents")
    got = sorted(
        tuple(r)
        for r in decontaminate(
            d.filter("doc_id % 17 != 0"),
            d.filter("doc_id % 17 = 0"),
            "doc_id",
            "text",
            k=3,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            decontaminate_sql(
                "SELECT * FROM documents WHERE doc_id % 17 <> 0",
                "SELECT * FROM documents WHERE doc_id % 17 = 0",
                "doc_id",
                "text",
                k=3,
            )
        ).fetchall()
    )
    assert got == want


def test_repetition_profile_flags_and_empties(spark):
    from sqlserver_pg_cdc_spark.functions.text import repetition_profile

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "all unique words here with no repeats at all today"),
            (3, ""),
            (4, "one"),  # fewer tokens than k: zero 2-grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_profile(df, "doc_id", "text").collect()}
    assert rows[1]["n_grams"] == 5 and rows[1]["n_distinct_grams"] == 1
    assert rows[1]["dup_gram_frac"] == 0.8 and rows[1]["top_gram_frac"] == 1.0
    assert rows[2]["dup_gram_frac"] == 0.0
    assert rows[3]["n_grams"] == 0 and rows[3]["top_gram_frac"] == 0.0
    assert rows[4]["n_grams"] == 0
    assert len(rows) == 4


def test_hyperplanes_cache_is_immutable():
    """The memoized plane family must not be corruptible by a caller."""
    import pytest as _pytest

    from sqlserver_pg_cdc_spark.operators.similarity import hyperplanes

    planes = hyperplanes(2, 3, "immutability-test")
    with _pytest.raises(TypeError):
        planes[0] = (9.0, 9.0, 9.0)  # type: ignore[index]
    with _pytest.raises(TypeError):
        planes[0][0] = 9.0  # type: ignore[index]
    assert hyperplanes(2, 3, "immutability-test") == planes


# --- product quantization -------------------------------------------------


def test_pq_encode_codes_shape_and_determinism(spark):
    from sqlserver_pg_cdc_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    emb = load(spark, "embeddings")
    books = pq_codebooks(emb, "vec_id", "embedding", m_sub=8, k_codes=16)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(cw) == 8 for b in books for cw in b)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    rows = codes.collect()
    assert len(rows) == emb.filter(F.col("embedding").isNotNull()).count()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])
    # deterministic: re-encoding yields identical codes
    again = {r["id"]: r["codes"] for r in pq_encode(
        emb, "vec_id", "embedding", books).collect()}
    assert all(again[r["id"]] == r["codes"] for r in rows)
    # a codebook seed vector encodes to its own codeword in every subspace
    seed_ids = [r["vec_id"] for r in emb.filter(F.col("embedding").isNotNull())
                .orderBy("vec_id").limit(16).select("vec_id").collect()]
    first = {r["id"]: r["codes"] for r in rows}[seed_ids[0]]
    assert first == [0] * 8


def test_topk_pq_equals_bruteforce_when_refine_covers_corpus(spark):
    from sqlserver_pg_cdc_spark.operators.similarity import topk_pq

    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    exact = sorted(tuple(r) for r in
                   topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect())
    pq = sorted(tuple(r) for r in
                topk_pq(emb, q, "vec_id", "embedding", k=5, refine=n).collect())
    # refine >= corpus: the ADC cut keeps everything, the exact re-rank
    # must reproduce brute force bit-for-bit
    assert pq == exact


def test_topk_pq_recall_vs_exact(spark):
    from sqlserver_pg_cdc_spark.operators.similarity import topk_pq

    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect()
    pq = topk_pq(emb, q, "vec_id", "embedding", k=5, refine=32).collect()
    es, ps = {}, {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["id"])
    for r in pq:
        ps.setdefault(r["query_id"], set()).add(r["id"])
    assert set(ps) == set(es)
    recalls = [len(es[k] & ps.get(k, set())) / len(es[k]) for k in es]
    mean = sum(recalls) / len(recalls)
    # 32 ADC candidates out of 500 unclustered vectors; PQ with
    # first-k codebooks must still put most true neighbors in the cut
    assert mean > 0.5, f"pq mean recall {mean}"


def test_trained_pq_codebooks_beat_probed_fraction(spark):
    from sqlserver_pg_cdc_spark.operators.similarity import (
        topk_pq,
        train_pq_codebooks,
    )

    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    books = train_pq_codebooks(emb, "embedding", m_sub=8, k_codes=16, max_iter=5)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    exact = topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect()
    pq = topk_pq(emb, q, "vec_id", "embedding", k=5, refine=32,
                 books=books).collect()
    es, ps = {}, {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["id"])
    for r in pq:
        ps.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [len(es[k] & ps.get(k, set())) / len(es[k]) for k in es]
    mean = sum(recalls) / len(recalls)
    assert mean > 0.5, f"trained pq mean recall {mean}"


def test_pq_null_vectors_and_bad_dim(spark):
    from sqlserver_pg_cdc_spark.operators.similarity import (
        pq_codebooks,
        topk_pq,
    )

    emb = load(spark, "embeddings")
    with_null = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 3, F.lit(None)).otherwise(F.col("embedding")),
    )
    out = topk_pq(with_null, with_null.filter(F.col("vec_id") < 5),
                  "vec_id", "embedding", k=5).collect()
    assert all(r["id"] != 3 for r in out)
    assert {r["query_id"] for r in out} == {0, 1, 2, 4}
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(emb, "vec_id", "embedding", m_sub=7)


# --- IVF-PQ composite (coarse cells + residual quantization) -----------------


def test_topk_ivfpq_equals_bruteforce_when_everything_probed(spark):
    """n_probe = n_cells and refine >= corpus degrade IVF-PQ to brute
    force: every cell probed, the ADC cut keeps everything, the exact
    re-rank must reproduce brute force bit-for-bit."""
    from sqlserver_pg_cdc_spark.operators.similarity import topk_ivfpq

    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    exact = sorted(tuple(r) for r in
                   topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect())
    got = sorted(tuple(r) for r in topk_ivfpq(
        emb, q, "vec_id", "embedding", k=5,
        n_cells=8, n_probe=8, m_sub=4, k_codes=8, refine=n,
    ).collect())
    assert got == exact


def test_topk_ivfpq_recall_vs_exact_and_vs_ivf_flat(spark):
    """Same probe budget as the IVF-flat recall test (4/8 cells): the
    residual-ADC candidate cut must not destroy what cell probing kept
    (recall within 0.15 of IVF-flat, and clearly above the probed
    fraction); cosines of the hits are EXACT (re-ranked). The synthetic
    embeddings are unclustered — the hardest case for cell probing."""
    from sqlserver_pg_cdc_spark.operators.similarity import topk_ivf, topk_ivfpq

    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = topk_brute_force(emb, q, "vec_id", "embedding", k=5).collect()
    got = topk_ivfpq(
        emb, q, "vec_id", "embedding", k=5,
        n_cells=8, n_probe=4, m_sub=4, k_codes=8, refine=64,
    ).collect()
    flat = topk_ivf(
        emb, q, "vec_id", "embedding", k=5, n_cells=8, n_probe=4,
    ).collect()
    es, gs, fs = {}, {}, {}
    for r in exact:
        es.setdefault(r["query_id"], {})[r["id"]] = r["cosine"]
    for r in got:
        gs.setdefault(r["query_id"], {})[r["id"]] = r["cosine"]
    for r in flat:
        fs.setdefault(r["query_id"], set()).add(r["id"])
    rec = lambda hits: sum(
        len(set(es[k]) & set(hits.get(k, set()))) / len(es[k]) for k in es
    ) / len(es)
    mean, mean_flat = rec(gs), rec(fs)
    assert mean > 0.35, f"ivfpq mean recall {mean}"
    assert mean >= mean_flat - 0.15, (mean, mean_flat)
    # exact cosines for every overlapping hit
    for k in es:
        for i in set(es[k]) & set(gs.get(k, {})):
            assert abs(es[k][i] - gs[k][i]) < 1e-12


def test_topk_ivfpq_trained_inputs_and_degenerates(spark):
    """Trained centroids + trained residual books flow through the same
    probe; empty corpus and NULL vectors behave like the PQ/IVF paths."""
    from sqlserver_pg_cdc_spark.operators.similarity import (
        topk_ivfpq,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from sqlserver_pg_cdc_spark.functions.vectors import vsub

    emb = load(spark, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cents = train_ivf_centroids(emb.select("embedding"), "embedding", n_cells=8)
    got = topk_ivfpq(
        emb, q, "vec_id", "embedding", k=5,
        n_cells=8, n_probe=3, m_sub=4, k_codes=8, refine=48,
        centroids=cents,
    ).collect()
    assert {r["query_id"] for r in got} == set(range(5))
    assert all(len([x for x in got if x["query_id"] == i]) == 5
               for i in range(5))
    # empty corpus -> empty result frame with the family schema
    empty = emb.filter("vec_id < 0")
    z = topk_ivfpq(empty, q, "vec_id", "embedding", k=5, n_cells=4,
                   m_sub=4, k_codes=4)
    assert z.count() == 0
    assert z.columns == ["query_id", "rank", "id", "cosine"]
    # NULL vectors excluded on both sides
    base = emb.select("vec_id", "embedding")
    withnull = base.unionByName(spark.createDataFrame(
        [(99991, None)], "vec_id long, embedding array<float>"
    ).select(
        "vec_id",
        F.col("embedding").cast(dict(base.dtypes)["embedding"]).alias(
            "embedding"
        ),
    ))
    g2 = topk_ivfpq(withnull, withnull.filter("vec_id IN (1, 99991)"),
                    "vec_id", "embedding", k=3, n_cells=8, n_probe=2,
                    m_sub=4, k_codes=8)
    assert {r["query_id"] for r in g2.collect()} == {1}
