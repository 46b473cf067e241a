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
