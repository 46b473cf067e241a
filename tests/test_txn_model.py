"""Model-based randomized test of the TxnTable op surface: a seeded
random sequence of append / merge / delete_where / overwrite_partitions
/ compact runs against BOTH the real table and an in-memory multiset
model; after every op the manifest row count must match the model, the
full snapshot must match at checkpoints, and time travel must replay
every recorded historical state exactly. This is the ACID layer's
sanity net: any drift between log bookkeeping (incremental commits,
checkpoints, per-file stats, carried-by-reference files) and actual
data shows up as a model divergence."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import TxnTable
from interop_datalake_spark.session import DatalakeSession

TENANTS = ["A", "B", "C"]
KEYS = list(range(8))


@pytest.fixture()
def session(spark, tmp_path):
    return DatalakeSession(lake_root=str(tmp_path / "lake"), spark=spark)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING, tenant STRING")


def _snapshot(table, version=None):
    try:
        return Counter(
            (r["k"], r["v"], r["tenant"])
            for r in table.read(version=version).collect()
        )
    except FileNotFoundError:  # empty table
        return Counter()


def _random_rows(rng, n):
    return [
        (rng.choice(KEYS), f"v{rng.randrange(1000)}", rng.choice(TENANTS))
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [42, 7])
def test_random_op_sequence_matches_model(spark, session, seed):
    rng = random.Random(seed)
    t = TxnTable(
        session, "model", stats_cols=["k"], partition_cols=["tenant"],
        checkpoint_interval=5,
    )
    model: Counter = Counter()
    recorded: dict[int, Counter] = {}

    def do_append():
        rows = _random_rows(rng, rng.randrange(1, 6))
        t.append(_df(spark, rows))
        model.update(rows)

    def do_merge():
        rows = _random_rows(rng, rng.randrange(1, 4))
        # merge keys include the partition column (the rebase-safe,
        # partition-scoped discipline); dedupe update rows per key the
        # way a real CDC batch would
        by_key = {}
        for k, v, tenant in rows:
            by_key[(k, tenant)] = (k, v, tenant)
        ups = list(by_key.values())
        t.merge(_df(spark, ups), key_cols=["k", "tenant"])
        for (k, tenant), row in by_key.items():
            for existing in [
                key for key in model if key[0] == k and key[2] == tenant
            ]:
                del model[existing]
            model[row] += 1

    def do_delete():
        k = rng.choice(KEYS)
        t.delete_where(F.col("k") == k)
        for existing in [key for key in model if key[0] == k]:
            del model[existing]

    def do_overwrite_partitions():
        tenant = rng.choice(TENANTS)
        rows = [
            (rng.choice(KEYS), f"ow{rng.randrange(1000)}", tenant)
            for _ in range(rng.randrange(1, 4))
        ]
        t.overwrite_partitions(_df(spark, rows))
        for existing in [key for key in model if key[2] == tenant]:
            del model[existing]
        model.update(rows)

    def do_compact():
        t.compact(target_files=2)

    def do_merge_sync():
        # tenant-scoped full-state sync: the source IS tenant T's
        # complete new state, so the model drops every T row and
        # installs the source rows
        tenant = rng.choice(TENANTS)
        rows = [
            (rng.choice(KEYS), f"ms{rng.randrange(1000)}", tenant)
            for _ in range(rng.randrange(1, 4))
        ]
        by_key = {}
        for k, v, tn in rows:
            by_key[(k, tn)] = (k, v, tn)
        ups = list(by_key.values())
        t.merge_sync(
            _df(spark, ups),
            key_cols=["k", "tenant"],
            scope=F.col("tenant") == tenant,
        )
        for existing in [key for key in model if key[2] == tenant]:
            del model[existing]
        model.update(ups)

    def do_clone_check():
        # zero-copy branch must equal the model, then vanish without
        # touching the source
        import shutil
        import uuid

        name = f"model_clone_{uuid.uuid4().hex[:6]}"
        c = t.clone_to(name)
        try:
            got = _snapshot(c)
        finally:
            shutil.rmtree(c.root, ignore_errors=True)
        assert got == model, "clone diverged from model"

    ops = (
        [do_append] * 3
        + [do_merge] * 3
        + [do_delete, do_overwrite_partitions, do_compact, do_merge_sync,
           do_clone_check]
    )
    do_append()  # seed so every op has a table to act on
    for i in range(24):
        rng.choice(ops)()
        m = t.manifest()
        assert m["rows"] == sum(model.values()), (
            f"op {i}: manifest rows {m['rows']} != model {sum(model.values())}"
        )
        if i % 6 == 0:
            assert _snapshot(t) == model, f"op {i}: snapshot diverged"
            recorded[t.current_version()] = Counter(model)

    assert _snapshot(t) == model
    # time travel: every recorded historical state replays exactly
    for version, want in recorded.items():
        assert _snapshot(t, version) == want, f"time travel to v{version}"
