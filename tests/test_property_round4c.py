"""Property-based tests for the continuation-2 operators: Spark
implementations vs brute-force Python references on arbitrary inputs
(same fuzz layer as tests/test_property.py). Example counts are small
because each example is a real Spark job.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from interop_datalake_spark.catalog.graph_ops import triangle_counts
from interop_datalake_spark.llm.dedup import containment_pairs
from interop_datalake_spark.llm.search import phrase_search

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# --- triangles -------------------------------------------------------------

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=0,
    max_size=25,
)


def _triangles_model(pairs):
    edges = {tuple(sorted(p)) for p in pairs}
    nodes = sorted({n for e in edges for n in e})
    counts = {}
    for a, b, c in combinations(nodes, 3):
        if (
            (a, b) in edges and (b, c) in edges and (a, c) in edges
        ):
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


@given(_edges_strategy)
@settings(**_SETTINGS)
def test_triangle_counts_match_bruteforce(spark, pairs):
    edges = {tuple(sorted(p)) for p in pairs}
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "u BIGINT, v BIGINT")
    got = {
        r["user_id"]: r["n_triangles"]
        for r in triangle_counts(df).collect()
    }
    assert got == _triangles_model(pairs)


# --- phrase search ---------------------------------------------------------

_word = st.sampled_from(["a", "b", "c", "ab"])
_doc_words = st.lists(_word, min_size=0, max_size=12)


def _phrase_model(docs, phrase):
    out = {}
    m = len(phrase)
    for doc_id, words in docs:
        hits = [
            i
            for i in range(len(words) - m + 1)
            if words[i : i + m] == phrase
        ]
        if hits:
            out[doc_id] = (len(hits), hits[0])
    return out


@given(
    st.lists(_doc_words, min_size=1, max_size=5),
    st.lists(_word, min_size=1, max_size=3),
)
@settings(**_SETTINGS)
def test_phrase_search_matches_sliding_window(spark, docs_words, phrase):
    docs = [(i, ws) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs], "doc_id BIGINT, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_search(df, "text", "doc_id", phrase).collect()
    }
    assert got == _phrase_model(docs, phrase)


# --- containment -----------------------------------------------------------


def _shingles(words, k):
    return {
        " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
    }


def _containment_model(docs, k, threshold):
    sh = {d: _shingles(ws, k) for d, ws in docs}
    out = {}
    for (a, sa), (b, sb) in combinations(sorted(sh.items()), 2):
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        c = inter / min(len(sa), len(sb))
        if c >= threshold:
            out[(a, b)] = (inter, len(sa), len(sb))
    return out


@given(st.lists(st.lists(_word, min_size=0, max_size=10), min_size=2, max_size=5))
@settings(**_SETTINGS)
def test_containment_matches_set_model(spark, docs_words):
    k, threshold = 2, 0.5
    docs = [(i, ws) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs], "doc_id BIGINT, text STRING"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["n_a"], r["n_b"])
        for r in containment_pairs(
            df, "text", "doc_id", k=k, threshold=threshold,
            max_shingle_freq=1000,
        ).collect()
    }
    assert got == _containment_model(docs, k, threshold)
