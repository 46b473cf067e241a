"""Bounded-commit driver write (round 15): the pyarrow fast path must
be invisible — identical visible table state to the distributed
writer, byte-identical Hive dir names, and the batched cached
transform-literal evaluation must equal the per-literal build."""

import os
import shutil
import tempfile
from datetime import date

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.lake.txn import (
    TxnTable,
    _part_dir_value,
    _plan_size_estimate,
)
from interop_datalake_spark.session import DatalakeSession

_KEY = "spark.interop.datalake.driverCommit.maxBytes"


@pytest.fixture()
def lake(tmp_path, spark):
    return DatalakeSession(lake_root=str(tmp_path / "lake"), spark=spark)


def _lifecycle(session, spark, sf_dir, driver_on: bool):
    spark.conf.set(_KEY, str(32 * 1024 * 1024) if driver_on else "0")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey",
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("prio"),  # values with spaces
        )
        t = TxnTable(
            session,
            f"t_{'on' if driver_on else 'off'}",
            stats_cols=["o_orderkey"],
            partition_cols=["prio"],
        )
        t.append(orders.filter(F.col("o_orderkey") < 300).repartition(3))
        t.merge(
            orders.filter(F.col("o_orderkey") < 100).withColumn(
                "price", F.col("price") + 1
            ),
            ["o_orderkey"],
        )
        t.delete_where(F.col("o_orderkey") % 7 == 0, merge_on_read=True)
        state = t._state(t.current_version())
        return {
            "snap": sorted(tuple(r) for r in t.read().collect()),
            "rng": sorted(
                tuple(r)
                for r in t.read(key_range=("o_orderkey", 50, 120)).collect()
            ),
            "pf": sorted(
                tuple(r)
                for r in t.read(
                    partition_filter={"prio": "4-NOT SPECIFIED"}
                ).collect()
            ),
            "files_per_commit": [
                len(t.commit_record(v).get("added", []))
                for v in range(1, t.current_version() + 1)
            ],
            "stats_set": sorted(
                tuple(sorted((k, str(v)) for k, v in st.items()))
                for st in state["stats"].values()
            ),
            "parts_set": sorted(
                tuple(sorted(p.items()))
                for p in state["partitions"].values()
            ),
            "history": [
                (h["version"], h["op"], h.get("rows_total"))
                for h in t.history()
            ],
        }
    finally:
        spark.conf.unset(_KEY)


def test_driver_commit_state_identical_to_distributed(lake, spark, sf_dir):
    a = _lifecycle(lake, spark, sf_dir, driver_on=False)
    b = _lifecycle(lake, spark, sf_dir, driver_on=True)
    assert a == b


def test_part_dir_value_matches_spark_escaper(spark, tmp_path):
    """Byte-identity of the driver writer's Hive dir names against
    Spark's own partitionBy output, over the tricky value classes
    (escaped chars, verbatim specials, unicode, null, empty)."""
    vals = [
        "4-NOT SPECIFIED", "a,b", "a+b", "a%b", "a=b", "a:b", "a#b",
        "ä", "a'b", "(x)", "a&b", "a\tb", "a{b", "a[b]", None, "",
        "plain",
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id INT, p STRING"
    )
    d = str(tmp_path / "esc")
    df.write.mode("overwrite").partitionBy("p").parquet(d)
    spark_dirs = {
        n[2:] for n in os.listdir(d) if n.startswith("p=")
    }
    ours = {_part_dir_value(v) for v in vals}
    assert ours == spark_dirs
    # int/date spellings
    assert _part_dir_value(5) == "5"
    assert _part_dir_value(date(2024, 1, 3)) == "2024-01-03"
    # refused types fall back to the distributed writer
    assert _part_dir_value(True) is None
    assert _part_dir_value(1.5) is None


def test_leaf_estimate_gates_like_broadcast(spark, sf_dir):
    scan = spark.read.parquet(f"{sf_dir}/orders.parquet")
    est = _plan_size_estimate(scan.filter(F.col("o_orderkey") < 10))
    assert est is not None and 0 < est < 64 * 1024 * 1024
    # joins must SUM the leaves, not multiply them
    two = scan.alias("a").join(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        F.col("a.o_custkey") == F.col("c_custkey"),
    )
    assert _plan_size_estimate(two) < 64 * 1024 * 1024
    # RDD-backed local frames have no usable estimate -> None
    rdd_df = spark.createDataFrame(
        spark.sparkContext.parallelize([(1,)], 1), "x INT"
    )
    assert _plan_size_estimate(rdd_df) is None


def test_transform_literals_batched_equals_per_literal(lake, spark, sf_dir):
    """The cached batched probe path must return the same transform
    values as the historical per-literal expression build (replicated
    inline here — it still serves schema-less tables)."""
    import json as _json

    from pyspark.sql.types import StructType

    from interop_datalake_spark.lake.txn import _transform_value_expr

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    t = TxnTable(
        lake,
        "tl",
        stats_cols=["o_orderkey"],
        partition_transforms={
            "b": ["bucket_mm3", 8, "o_orderkey"],
            "tr": ["truncate", 100, "o_orderkey"],
        },
    )
    t.append(orders.limit(50))
    state = t._state(t.current_version())
    # the caller (resolve_files) only passes specs whose SOURCE is the
    # probed key column — both transforms here source o_orderkey
    specs = dict(state["partition_transforms"])
    values = [3, 17, 4242]
    got = t._transform_literals(specs, values, state)

    st = StructType.fromJson(_json.loads(state["schema"]))
    src_types = {f.name: f.dataType.simpleString() for f in st.fields}
    sel = [
        _transform_value_expr(
            F.lit(v), spec, src_types.get(spec[-1])
        ).alias(f"{name}__{i}")
        for name, spec in specs.items()
        for i, v in enumerate(values)
    ]
    row = spark.range(1).select(*sel).collect()[0]
    ref = {
        name: [row[f"{name}__{i}"] for i in range(len(values))]
        for name in specs
    }
    assert got == ref
    assert all(v is not None and 0 <= v < 8 for v in got["b"])
    assert got["tr"] == [0, 0, 4200]
