"""Property-based tests (hypothesis): the Spark column implementations
must agree with simple Python reference models on arbitrary inputs —
the fuzz layer the reference's example-based tests lack (SURVEY §5
"no property-based/randomized testing")."""

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from interop_datalake_spark.functions.hl7 import get_msh9
from interop_datalake_spark.operators.joins import asof_join

# ---------------------------------------------------------------------------
# HL7 MSH-9: python reference model mirroring HL7Utils.kt:11-40 semantics
# ---------------------------------------------------------------------------


def _msh9_model(message: str) -> list[str]:
    import re

    idx = message.find("MSH")
    if idx < 0:
        return []
    # CR/LF only — str.splitlines() would also split on \x1c/\x1e/\x85
    # etc., which neither the reference's lines() nor the Spark impl do
    line = re.split(r"\r\n|\r|\n", message[idx:])[0]
    if len(line) < 5:
        return []
    sep1, sep2 = line[3], line[4]
    fields = line.split(sep1, 9)
    if len(fields) < 10:
        return []
    msh9 = fields[8]
    if len(msh9) != 7 or msh9[3] != sep2:
        return []
    return msh9.split(sep2, 1)


_hl7_text = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="\x00\\"
    ),
    max_size=200,
)


@st.composite
def hl7_messages(draw):
    """Mix of random text and realistic-ish MSH headers."""
    if draw(st.booleans()):
        return draw(_hl7_text)
    sep1 = draw(st.sampled_from("|#!"))
    sep2 = draw(st.sampled_from("^*~"))
    n_fields = draw(st.integers(min_value=3, max_value=14))
    fields = [
        draw(st.text(st.characters(codec="ascii", exclude_characters="\r\n\x00\\" + sep1 + sep2), max_size=8))
        for _ in range(n_fields)
    ]
    msh9 = draw(
        st.one_of(
            st.just("MDM" + sep2 + "T02"),
            st.just("MDMD" + sep2 + "T02"),
            st.just("MDMDT02"),
            st.just(""),
        )
    )
    if n_fields > 8:
        fields[8] = msh9
    return "MSH" + sep1 + sep2 + sep1.join(fields[1:])


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(hl7_messages(), min_size=1, max_size=20))
def test_msh9_matches_model(spark, messages):
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(messages)], "i INT, message STRING"
    )
    got = {
        r["i"]: r["m"] for r in df.select("i", get_msh9("message").alias("m")).collect()
    }
    for i, m in enumerate(messages):
        assert got[i] == _msh9_model(m), f"input {m!r}"


# ---------------------------------------------------------------------------
# as-of join vs brute force
# ---------------------------------------------------------------------------


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_asof_join_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    keys = [1, 2, 3]
    left = [
        (rng.choice(keys), rng.randint(0, 1000), i) for i in range(rng.randint(1, 25))
    ]
    right = [
        (rng.choice(keys), rng.randint(0, 1000), rng.randint(0, 99))
        for _ in range(rng.randint(0, 25))
    ]
    ldf = spark.createDataFrame(left, "k INT, lts LONG, lid INT")
    rdf = spark.createDataFrame(right, "k INT, rts LONG, rv INT")
    out = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts", right_values=["rv"]
    )
    got = {r["lid"]: r["rv_asof"] for r in out.collect()}

    for k, lts, lid in left:
        cands = [(rts, rv) for (rk, rts, rv) in right if rk == k and rts <= lts]
        if not cands:
            expected = None
        else:
            # operator contract: latest ts wins; among equal ts the value
            # carried is the last in window order (implementation detail) —
            # assert only the timestamp-correctness part when ties exist
            best_ts = max(c[0] for c in cands)
            tied = [rv for (rts, rv) in cands if rts == best_ts]
            if len(tied) > 1:
                assert got[lid] in tied, f"lid={lid}"
                continue
            expected = tied[0]
        assert got[lid] == expected, f"lid={lid} k={k} lts={lts}"
