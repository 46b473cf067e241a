"""Scale-contract tests: the physical plans must be the ones that
survive 100 TB — pushdown, pruning, broadcasts, top-k rewrite, and no
accidental cartesian products (SURVEY §4; plans/inspect.py)."""

from pyspark.sql import functions as F

from interop_datalake_spark.catalog.relational import (
    join_broadcast,
    q3_shipping_priority,
    scan_filter_project,
    sort_limit_topk,
)
from interop_datalake_spark.catalog.windows import join_range
from interop_datalake_spark.operators.joins import range_join
from interop_datalake_spark.plans.inspect import (
    codegen_stage_count,
    has_broadcast_hash_join,
    has_cartesian_product,
    has_pushed_filters,
    has_take_ordered,
    pruned_read_schema,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = scan_filter_project(spark, sf_dir)
    assert has_pushed_filters(df), "predicates must reach the parquet reader"


def test_column_pruning(spark, sf_dir):
    df = scan_filter_project(spark, sf_dir)
    cols = pruned_read_schema(df)
    # 11-column table, 3-column projection (+2 filter cols)
    assert 0 < len(cols) <= 5, f"scan reads too much: {cols}"
    assert "l_extendedprice" not in cols


def test_dim_join_broadcasts(spark, sf_dir):
    assert has_broadcast_hash_join(join_broadcast(spark, sf_dir))
    # q3 carries NO hint on customer — at test SF Catalyst's size
    # estimate still picks broadcast, proving AQE/size-based selection
    # works without forcing it (at 100× it would shuffle-join instead)
    assert has_broadcast_hash_join(q3_shipping_priority(spark, sf_dir))


def test_no_forced_broadcast_of_sf_scaled_tables():
    """Scale lint: broadcast hints are reserved for fixed-size dims
    (nation/region/filtered key sets). Hinting an SF-scaled table
    (customer/supplier/part/orders/lineitem) overrides AQE's size check
    and OOMs at 100× — the round-1 verdict's top scale anti-pattern."""
    import re
    from pathlib import Path

    catalog_dir = Path(__file__).parent.parent / "interop_datalake_spark"
    banned = re.compile(
        r"F\.broadcast\(\s*(cust|supp|part|orders|li|lineitem)\b"
    )
    offenders = []
    for py in catalog_dir.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if banned.search(line):
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, "SF-scaled table broadcast-hinted:\n" + "\n".join(offenders)


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    assert has_take_ordered(sort_limit_topk(spark, sf_dir))


def test_range_join_is_not_cartesian(spark, sf_dir):
    df = join_range(spark, sf_dir)
    assert not has_cartesian_product(df), (
        "bucketed range join must plan as an equi-join, not a cross product"
    )


def test_no_cartesian_in_bucketed_range_join_generic(spark):
    left = spark.range(100).select(
        F.col("id").alias("k"), F.timestamp_micros(F.col("id") * 1000000).alias("lts")
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), F.timestamp_micros(F.col("id") * 1500000).alias("rts")
    )
    out = range_join(left, right, "k", "lts", "rts", 60.0)
    assert not has_cartesian_product(out)


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE wraps the plan in AdaptiveSparkPlan and defers codegen
    # compilation, so toggle it off just for this structural assertion
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = scan_filter_project(spark, sf_dir)
        assert codegen_stage_count(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_triangle_counting_broadcasts_degrees_no_cartesian(spark, sf_dir):
    from interop_datalake_spark.catalog.graph_ops import graph_triangles

    df = graph_triangles(spark, sf_dir)
    # the wedge/closure joins are equi-joins — a cartesian anywhere
    # means the orientation broke. (The degree broadcast sits above
    # the localCheckpoint boundary, so it's not in this final plan;
    # the explode-not-union corner expansion keeps the join subtree
    # single — asserted structurally below.)
    assert not has_cartesian_product(df)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Generate" in plan  # explode present
    # count tree entries only ("<op> <join-type> (<id>)"); the formatted
    # detail section repeats each node name once more
    n_joins = plan.count("SortMergeJoin Inner (") + plan.count(
        "BroadcastHashJoin Inner ("
    )
    assert n_joins <= 2, (
        "corner expansion must not replicate the triangle join: "
        f"{n_joins} joins in tree"
    )


def test_heavy_hitters_counters_broadcast(spark, sf_dir):
    from interop_datalake_spark.catalog.events_analytics import (
        events_heavy_hitters,
    )

    df = events_heavy_hitters(spark, sf_dir)
    # the d×w counters table joins broadcast-side: the estimate pass
    # must never shuffle the key set against a 16k-row sketch
    assert has_broadcast_hash_join(df)


def test_phrase_search_prunes_postings_before_shuffle(spark, sf_dir):
    from interop_datalake_spark.catalog.llm_ops import search_phrase

    df = search_phrase(spark, sf_dir)
    # the phrase-slots literal joins as a broadcast, so only matching
    # postings reach the anchor groupBy's exchange
    assert has_broadcast_hash_join(df)
    assert not has_cartesian_product(df)


def test_q21_multi_exists_is_not_cartesian(spark, sf_dir):
    """Round-9 verdict item 7: both EXISTS/NOT-EXISTS subqueries stay
    equi-keyed on l_orderkey (the suppkey inequality is a join-side
    filter, not the key) — neither may degenerate to a cartesian or
    broadcast-nested-loop join."""
    from interop_datalake_spark.catalog.tpch_extra import (
        q21_suppliers_kept_waiting,
    )

    df = q21_suppliers_kept_waiting(spark, sf_dir)
    assert not has_cartesian_product(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_q6_predicates_reach_the_scan(spark, sf_dir):
    """q6 is the canonical pushdown query: all three range predicates
    must reach the parquet reader and the scan must not read the
    un-projected money columns' siblings it doesn't need."""
    from interop_datalake_spark.catalog.tpch_extra import (
        q6_forecast_revenue,
    )

    df = q6_forecast_revenue(spark, sf_dir)
    assert has_pushed_filters(df)
    cols = pruned_read_schema(df)
    assert "l_orderkey" not in cols and "l_returnflag" not in cols


def test_tpch_analogs_are_not_vacuous(spark, sf_dir):
    """Round-10 review: a predicate literal that matches nothing in
    the SYNTHETIC testdata makes a query and its oracle vacuously
    equal (empty/NULL) — the parity gate proves nothing. Pin that the
    selective TPC-H analogs actually produce data."""
    from interop_datalake_spark.catalog.tpch_extra import (
        q8_market_share,
        q20_semi_chain_suppliers,
        q21_suppliers_kept_waiting,
        q22_dormant_customers,
    )

    assert q20_semi_chain_suppliers(spark, sf_dir).count() > 0
    q8 = q8_market_share(spark, sf_dir).collect()
    assert q8 and any(r.target_volume is not None for r in q8)
    assert any(
        r.mkt_share is not None and r.mkt_share > 0 for r in q8
    )
    assert q21_suppliers_kept_waiting(spark, sf_dir).count() > 0
    assert q22_dormant_customers(spark, sf_dir).count() > 0
    # Round-11: q5 shipped with TPC-H's canonical 1994 window, which
    # predates every synthetic orderdate (orders start 1995-01-01) —
    # it was witnessed driver-green on a 0-row result. Pin non-empty.
    from interop_datalake_spark.catalog.relational import (
        q5_local_supplier_volume,
    )

    assert q5_local_supplier_volume(spark, sf_dir).count() > 0
