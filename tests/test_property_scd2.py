"""Property pin for the SCD2 change-fold (lake/scd.py:
scd2_apply_changes): for ARBITRARY per-key event histories, the
Type-2 table's point-in-time reads must equal a naive Python replay
of the feed at every sequence value — the fuzz layer behind the
example-based feed-replay tests (random mixes of inserts, deletes,
update image pairs, same-sequence collisions, re-inserts after
deletes)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from interop_datalake_spark.lake.scd import (
    scd2_apply_changes,
    scd2_snapshot_at,
)
from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

pytestmark = pytest.mark.filterwarnings("ignore")

_PRIORITY = {
    "update_postimage": 3,
    "insert": 2,
    "delete": 1,
    "update_preimage": 0,
}


def _naive_state_at(events, at_seq):
    """Python reference: per key, events up to at_seq in (seq,
    priority) order; the last surviving insert/postimage wins, a
    delete clears."""
    state = {}
    by_key: dict = {}
    for k, v, seq, ctype in events:
        if seq <= at_seq:
            by_key.setdefault(k, []).append((seq, _PRIORITY[ctype], v, ctype))
    for k, evs in by_key.items():
        evs.sort()
        last = evs[-1]
        if last[3] in ("insert", "update_postimage"):
            state[k] = last[2]
    return state


# one event: (key 0-3, value 0-5, seq 1-6, change type). Same-(key,
# seq) collisions are allowed — the fold's priority rule must match
# the model's.
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=1, max_value=6),
        st.sampled_from(list(_PRIORITY)),
    ),
    min_size=1,
    max_size=14,
    # at most ONE event per (key, seq, type): duplicate identical
    # events are fine for the fold but make the naive model's
    # same-priority tie arbitrary on the VALUE — real feeds never
    # carry two different postimages for one key at one version
    unique_by=lambda e: (e[0], e[2], e[3]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_events)
def test_scd2_snapshots_match_naive_replay(spark, events):
    root = tempfile.mkdtemp(prefix="scd2_prop_")
    try:
        lake = DatalakeSession(lake_root=root, spark=spark)
        dim = TxnTable(lake, "prop_dim", stats_cols=["k"])
        feed = spark.createDataFrame(
            [(k, v, seq, ct) for k, v, seq, ct in events],
            "k INT, v INT, _commit_version BIGINT, _change_type STRING",
        )
        v = scd2_apply_changes(dim, feed, ["k"])
        if v is None:
            # a feed whose every key nets to delete/preimage opens no
            # version: nothing commits, and the naive model must agree
            # the state is empty at every sequence point
            assert dim.current_version() == 0
            for at in sorted({seq for _, _, seq, _ in events}):
                assert _naive_state_at(events, at) == {}
            return
        for at in sorted({seq for _, _, seq, _ in events}):
            want = _naive_state_at(events, at)
            got = {
                r["k"]: r["v"]
                for r in scd2_snapshot_at(dim, at).collect()
            }
            assert got == want, f"at seq {at}: {got} != {want}"
        # structural invariants: at most one current row per key,
        # intervals strictly ordered
        rows = dim.read().collect()
        cur = [r for r in rows if r["is_current"]]
        assert len(cur) == len({r["k"] for r in cur})
        assert all(
            r["valid_to"] is None or r["valid_to"] > r["valid_from"]
            for r in rows
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
