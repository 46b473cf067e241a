"""applyInPandasWithState: custom stateful operator converges to the
batch twin when the stream is fully consumed (availableNow)."""

import pytest

from interop_datalake_spark.sources.tables import load_table
from interop_datalake_spark.streaming.stateful import (
    running_user_stats,
    user_stats_batch_twin,
)


@pytest.fixture(scope="module")
def src_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful_src"))
    load_table(spark, sf_dir, "events").limit(3000).repartition(3).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stateful_running_stats_matches_batch(spark, src_dir):
    batch = spark.read.parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)

    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode emits one row per key per batch; the LAST emission per
    # key is the converged state
    got_df = spark.sql(
        """
        SELECT user_id, n_events, total_value, max_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM t_state
        ) WHERE rn = 1
        """
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
           for r in got_df.collect()}
    want = {r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
            for r in user_stats_batch_twin(batch).collect()}
    assert got == want


def test_stateful_dedup_emits_first_arrival_only(spark, tmp_path):
    """Cross-batch streaming dedup (stateful_dedup_stream): duplicates
    within a batch and across batches are dropped; state survives a
    checkpoint restart (the second run sees the first run's keys)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from interop_datalake_spark.streaming.stateful import (
        stateful_dedup_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    ck = str(tmp_path / "ck")
    pq.write_table(
        pa.table({"doc_id": [1, 2, 2, 3], "_batch": [0, 0, 0, 0]}),
        src / "a.parquet",
    )

    def drain(sink):
        sdf = spark.readStream.schema(
            "doc_id BIGINT, _batch BIGINT"
        ).parquet(str(src))
        q = (
            stateful_dedup_stream(sdf)
            .writeStream.outputMode("update")
            .foreachBatch(lambda b, e: sink.extend(b.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    got: list = []
    drain(got)
    assert sorted(r.doc_id for r in got) == [1, 2, 3]  # 2 deduped

    # second file: 2 and 3 are duplicates ACROSS batches, 4 is new
    pq.write_table(
        pa.table({"doc_id": [2, 4, 3, 4], "_batch": [1, 1, 1, 1]}),
        src / "b.parquet",
    )
    got2: list = []
    drain(got2)
    assert sorted(r.doc_id for r in got2) == [4]


def test_dedup_ttl_eviction_branch():
    """The TTL path, unit-pinned against a fake GroupState (a REAL
    ProcessingTimeTimeout stream can't drain under availableNow —
    measured: pending timeouts keep scheduling empty micro-batches
    until the TTL fires, documented in stateful_dedup_stream)."""
    import pandas as pd

    from interop_datalake_spark.streaming.stateful import _make_dedup_fn

    class FakeState:
        def __init__(self, exists=False, timed_out=False):
            self.exists, self.hasTimedOut = exists, timed_out
            self.removed, self.updated, self.ttl = False, None, None

        @property
        def get(self):
            return (1,)

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.ttl = ms

    fn = _make_dedup_fn(60_000)
    pdf = pd.DataFrame({"doc_id": [7], "_batch": [3]})

    # timed-out key: state dropped, nothing emitted
    st = FakeState(exists=True, timed_out=True)
    assert list(fn((7,), iter([pdf]), st)) == []
    assert st.removed and st.updated is None

    # fresh key: emitted once, TTL armed
    st = FakeState()
    out = list(fn((7,), iter([pdf]), st))
    assert len(out) == 1 and st.updated == (1,) and st.ttl == 60_000

    # duplicate: suppressed, TTL refreshed
    st = FakeState(exists=True)
    assert list(fn((7,), iter([pdf]), st)) == []
    assert st.ttl == 60_000 and not st.removed
