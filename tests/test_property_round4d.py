"""Property tests for the tail continuation-2 operators: Markov
transitions and basket-pair lift vs brute-force Python models.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from interop_datalake_spark.catalog.events_analytics import markov_transitions
from interop_datalake_spark.catalog.tpch_extra import pair_lift

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_types = st.sampled_from(["a", "b", "c"])


@given(st.lists(st.lists(_types, min_size=0, max_size=6), min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_markov_matches_sequence_model(spark, user_seqs):
    rows, eid = [], 0
    model: Counter = Counter()
    for uid, seq in enumerate(user_seqs):
        for i, t in enumerate(seq):
            rows.append((uid, i, eid, t))
            eid += 1
        for prev, nxt in zip(seq, seq[1:]):
            model[(prev, nxt)] += 1
    if not rows:
        return
    ev = spark.createDataFrame(
        [(u, float(ts), e, t) for u, ts, e, t in rows],
        "user_id BIGINT, ts DOUBLE, event_id BIGINT, event_type STRING",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in markov_transitions(ev).collect()
    }
    assert got == dict(model)
    # probabilities normalize per from_type
    by_from: Counter = Counter()
    for (f, _), n in model.items():
        by_from[f] += n
    for r in markov_transitions(ev).collect():
        want = model[(r["from_type"], r["to_type"])] / by_from[r["from_type"]]
        assert abs(r["p"] - round(want, 6)) < 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 6)),
        min_size=0,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_pair_lift_matches_set_model(spark, pairs_in):
    items = sorted(set(pairs_in))
    if not items:
        return
    df = spark.createDataFrame(items, "basket BIGINT, item BIGINT")
    got = {
        (r["pa"], r["pb"]): (r["n_pair"], r["n_a"], r["n_b"], r["lift"])
        for r in pair_lift(df, "basket", "item", min_support=1).collect()
    }
    baskets: dict = {}
    for b, i in items:
        baskets.setdefault(b, set()).add(i)
    n_b = len(baskets)
    freq: Counter = Counter(i for s in baskets.values() for i in s)
    model = {}
    pair_n: Counter = Counter()
    for s in baskets.values():
        for a, b in combinations(sorted(s), 2):
            pair_n[(a, b)] += 1
    for (a, b), n in pair_n.items():
        model[(a, b)] = (
            n,
            freq[a],
            freq[b],
            round(n * n_b / (freq[a] * freq[b]), 6),
        )
    assert got == model
