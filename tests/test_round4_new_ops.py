"""Planted-data unit tests for the late-round-4 operators: gap
sessionization, bigram-LM cross-entropy, SemDeDup, domain mix, and
PageRank invariants. The DuckDB parity suite (test_oracle_parity)
checks engine agreement; these pin the SEMANTICS against hand-computed
expectations on inputs small enough to verify by eye."""

import math

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.catalog.events_analytics import sessionize
from interop_datalake_spark.llm.clustering import semantic_dedup_pairs
from interop_datalake_spark.llm.lm import bigram_cross_entropy


def test_sessionize_planted_boundaries(spark):
    """30-min gap rule: 10:00, 10:10 (same session), 10:41 (10:10+31m,
    new session), second user independent. Exactly-30-min gap stays in
    the session (rule is strict >)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, 1.0),
        (1, "2024-01-01 10:10:00", 2, 2.0),
        (1, "2024-01-01 10:41:00", 3, 4.0),
        (2, "2024-01-01 10:00:00", 4, 8.0),
        (2, "2024-01-01 10:30:00", 5, 16.0),  # exactly 30 min: same session
    ]
    ev = spark.createDataFrame(
        rows, "user_id BIGINT, ts STRING, event_id BIGINT, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r.user_id, r.session_no): r
        for r in sessionize(ev).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)].n_events == 2
    assert out[(1, 1)].duration_us == 600_000_000
    assert out[(1, 1)].total_value == pytest.approx(3.0)
    assert out[(1, 2)].n_events == 1
    assert out[(1, 2)].duration_us == 0
    assert out[(2, 1)].n_events == 2  # 30-min gap does NOT split
    assert out[(2, 1)].total_value == pytest.approx(24.0)


def test_bigram_cross_entropy_hand_computed(spark):
    """Two-doc corpus small enough to compute by hand: doc 0 = 'a b a',
    doc 1 = 'a b'. Unigrams: a=3, b=2; V=2; bigrams: (a,b)=2, (b,a)=1.
    p(b|a) = 2.5/4, p(a|b) = 1.5/3."""
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "a b")], "doc_id BIGINT, text STRING"
    )
    out = {
        r.doc_id: r
        for r in bigram_cross_entropy(docs, "text", "doc_id").collect()
    }
    p_ba = (2 + 0.5) / (3 + 0.5 * 2)  # c12(a,b)+k over c1(a)+kV
    p_ab = (1 + 0.5) / (2 + 0.5 * 2)
    lp = lambda p: round(math.log(p), 9)
    assert out[0].n_bigrams == 2  # 'a b a' -> (a,b), (b,a)
    assert out[0].cross_entropy == pytest.approx(
        round(-(lp(p_ba) + lp(p_ab)) / 2, 6), abs=1e-9
    )
    assert out[1].n_bigrams == 1  # 'a b' -> (a,b)
    assert out[1].cross_entropy == pytest.approx(
        round(-lp(p_ba), 6), abs=1e-9
    )


def test_bigram_lm_single_token_doc_absent(spark):
    docs = spark.createDataFrame(
        [(0, "alone"), (1, "two words")], "doc_id BIGINT, text STRING"
    )
    ids = {
        r.doc_id for r in bigram_cross_entropy(docs, "text", "doc_id").collect()
    }
    assert ids == {1}


def test_semantic_dedup_planted_pairs(spark):
    """Two tight pairs on opposite poles plus noise points; k=2 Lloyd
    separates the poles, and within-cluster cosine at 0.99 finds
    exactly the planted pairs with lowest-id keepers."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),      # near-dup of 0
        (2, [-1.0, 0.0, 0.0]),
        (3, [-0.999, -0.01, 0.0]),    # near-dup of 2
        (4, [0.7, 0.7, 0.0]),         # same half-space as 0/1, not a dup
        (5, [-0.7, -0.7, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = {
        r.dup_id: (r.kept_id, r.cos)
        for r in semantic_dedup_pairs(
            emb, "embedding", "vec_id", k=2, iters=2, threshold=0.99
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1][0] == 0 and out[1][1] > 0.99
    assert out[3][0] == 2 and out[3][1] > 0.99


def test_pagerank_mass_and_hubs(spark, sf_dir):
    """Invariants of the catalog PageRank: total rank mass ≈ 1
    (teleport + symmetrized graph → conservation up to per-iteration
    rounding), and supplier hubs out-rank customers on average."""
    from interop_datalake_spark.catalog.graph_ops import graph_pagerank

    rows = graph_pagerank(spark, sf_dir).collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)
    sup = [r["rank"] for r in rows if r.node.startswith("s")]
    cus = [r["rank"] for r in rows if r.node.startswith("c")]
    assert sup and cus
    assert (sum(sup) / len(sup)) > 5 * (sum(cus) / len(cus))


def test_domain_mix_is_a_distribution(spark, sf_dir):
    from interop_datalake_spark.catalog.text_ops import corpus_domain_mix

    rows = corpus_domain_mix(spark, sf_dir).collect()
    assert len(rows) > 1
    assert sum(r.p_sample for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert all(r.p_sample > 0 for r in rows)


def test_bpe_overlap_count_and_greedy_merge(spark):
    """'aaaa aaaa aab': (a,a) counts overlaps (3·2 + 1 = 7); merging is
    leftmost-first non-overlapping ('aaaa' → [aa,aa], not [a,aa,a]);
    round 2 then merges (aa,aa) — which only exists if round 1 applied
    correctly."""
    from interop_datalake_spark.llm.bpe import bpe_train

    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aab")], "doc_id BIGINT, text STRING"
    )
    merges, syms = bpe_train(docs, "text", n_merges=2)
    got = [(r["rank"], r["left"], r["right"], r.pair_count)
           for r in merges.orderBy("rank").collect()]
    assert got == [(1, "a", "a", 7), (2, "aa", "aa", 2)]
    state = {
        (r.word, r.pos): r.sym for r in syms.collect()
    }
    assert state == {("aaaa", 1): "aaaa", ("aab", 1): "aa", ("aab", 2): "b"}


def test_bpe_tiebreak_lexicographic(spark):
    from interop_datalake_spark.llm.bpe import bpe_train

    docs = spark.createDataFrame(
        [(0, "cd ab")], "doc_id BIGINT, text STRING"
    )
    merges, _ = bpe_train(docs, "text", n_merges=1)
    r = merges.collect()[0]
    assert (r["left"], r["right"], r.pair_count) == ("a", "b", 1)


def test_hybrid_rrf_fuses_both_lists_above_single_list(spark):
    """RRF semantics on planted data: a document ranked in BOTH lists
    must outrank documents of similar single-list rank; NULL ranks
    mark single-list members; ranks tie-break deterministically."""
    from interop_datalake_spark.llm.search import hybrid_rrf

    docs = spark.createDataFrame(
        [
            (0, "zebra zebra zebra"),          # dense query doc, no terms
            (1, "alpha beta alpha beta"),      # strong lexical
            (2, "alpha beta"),                 # both lists
            (3, "gamma delta"),                # neither
        ],
        "doc_id BIGINT, text STRING",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),   # orthogonal to query
            (2, [0.9, 0.1, 0.0]),   # near the query
            (3, [0.8, 0.2, 0.0]),   # near the query
        ],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    out = hybrid_rrf(
        docs, emb, "text", "doc_id", "embedding", "vec_id",
        ["alpha", "beta"], query_vec_id=0, n_each=2, rrf_k=60, top_n=4,
    ).collect()
    rows = {r["doc_id"]: (r["lex_rank"], r["dense_rank"], r["rrf"]) for r in out}
    # doc 2: lexical rank 2 + dense rank 1 — fused top
    assert rows[2][0] == 2 and rows[2][1] == 1
    top = max(rows.items(), key=lambda kv: kv[1][2])
    assert top[0] == 2
    # single-list members carry NULL for the missing rank
    assert rows[1][0] == 1 and rows[1][1] is None
    assert rows[3][0] is None and rows[3][1] == 2
    # fused score is exactly the rank algebra
    assert abs(rows[2][2] - (1 / 62 + 1 / 61)) < 1e-12
