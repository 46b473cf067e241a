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
    """Literal transcription of HL7Utils.kt:11-40: separators at
    indexOf('MSH')+3/+4, but the limit-10 split runs over the WHOLE
    message from position 0; MSH-9 needs len 7 with sep2's FIRST
    occurrence at index 3; final split has no limit (Kotlin split(Char)
    keeps trailing empties, like Python str.split)."""
    idx = message.find("MSH")
    if idx < 0:
        return []
    if idx + 4 >= len(message):  # elementAtOrNull → null
        return []
    sep1, sep2 = message[idx + 3], message[idx + 4]
    fields = message.split(sep1, 9)  # Kotlin limit=10 ≡ Python maxsplit=9
    if len(fields) < 10:
        return []
    msh9 = fields[8]
    if len(msh9) == 7 and msh9.find(sep2) == 3:
        return msh9.split(sep2)
    return []


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
            st.just("MDM" + sep2 + "T" + sep2 + "2"),  # double component sep
            st.just("M" + sep2 + "M" + sep2 + "T02"),  # early first occurrence
            st.just(""),
        )
    )
    if n_fields > 8:
        fields[8] = msh9
    # content before 'MSH' (may contain the separator → shifts the
    # reference's whole-message field indices) and extra segments after
    prefix = draw(
        st.sampled_from(["", "junk ", "A" + sep1 + "B\n", "x\r\n", "pre" + sep2])
    )
    suffix = draw(st.sampled_from(["", "\r\nPID" + sep1 + "1" + sep1 + "x"]))
    return prefix + "MSH" + sep1 + sep2 + sep1.join(fields[1:]) + suffix


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
    """Two right payload columns, one of which is frequently NULL:
    pins (a) genuinely-NULL right values are NOT replaced by stale
    older rows, and (b) all output columns come from the SAME (most
    recent) right row — the struct-carry contract."""
    rng = random.Random(seed)
    keys = [1, 2, 3]
    left = [
        (rng.choice(keys), rng.randint(0, 1000), i) for i in range(rng.randint(1, 25))
    ]
    right = [
        (
            rng.choice(keys),
            rng.randint(0, 1000),
            rng.choice([None, rng.randint(0, 99)]),  # nullable payload
            rng.randint(0, 99),
        )
        for _ in range(rng.randint(0, 25))
    ]
    ldf = spark.createDataFrame(left, "k INT, lts LONG, lid INT")
    rdf = spark.createDataFrame(right, "k INT, rts LONG, rv INT, rw INT")
    out = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts", right_values=["rv", "rw"]
    )
    got = {r["lid"]: (r["rv_asof"], r["rw_asof"]) for r in out.collect()}

    for k, lts, lid in left:
        cands = [
            (rts, rv, rw) for (rk, rts, rv, rw) in right if rk == k and rts <= lts
        ]
        if not cands:
            assert got[lid] == (None, None), f"lid={lid}"
            continue
        # operator contract: latest ts wins; among equal ts any tied ROW
        # may be carried, but both columns must come from that one row
        best_ts = max(c[0] for c in cands)
        tied_pairs = [(rv, rw) for (rts, rv, rw) in cands if rts == best_ts]
        assert got[lid] in tied_pairs, f"lid={lid} k={k} lts={lts} got={got[lid]}"
