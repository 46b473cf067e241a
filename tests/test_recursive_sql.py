"""Pins for the modern-SQL surface (recursive CTE + LATERAL) and the
exact-substring dedup operator — semantics beyond what the DuckDB
parity gate proves (parity says "both engines agree"; these say the
agreed answer is the RIGHT one)."""

import pytest
from pyspark.sql import functions as F

from interop_datalake_spark.catalog.recursive_sql import (
    graph_ancestor_chain,
    lateral_topk_orders,
)
from interop_datalake_spark.llm.dedup import exact_substring_pairs


class TestAncestorChain:
    def test_known_depths_and_roots(self, spark, sf_dir):
        rows = {
            r.s_suppkey: (r.root_key, r.depth)
            for r in graph_ancestor_chain(spark, sf_dir).collect()
        }
        # keys < 10 are their own roots at depth 0 (guard on presence:
        # the sf0.001 smoke dir has fewer suppliers)
        for k in range(0, 10):
            if k in rows:
                assert rows[k] == (k, 0)
        # one hop / transitive, where those keys exist
        for key, expect in ((10, (1, 1)), (99, (9, 1)), (57, (5, 1))):
            if key in rows:
                assert rows[key] == expect
        assert rows, "ancestor chain returned no rows"

    def test_exactly_one_row_per_supplier(self, spark, sf_dir):
        from interop_datalake_spark.sources.tables import load_table

        n_supp = load_table(spark, sf_dir, "supplier").count()
        df = graph_ancestor_chain(spark, sf_dir)
        assert df.count() == n_supp
        assert df.select("s_suppkey").distinct().count() == n_supp

    def test_depth_matches_key_magnitude(self, spark, sf_dir):
        # depth is exactly the number of floor-div-10 steps to reach
        # a key < 10: len(str(k)) - 1 for k >= 1, and 0 for k = 0.
        for r in graph_ancestor_chain(spark, sf_dir).collect():
            k = r.s_suppkey
            expect = 0 if k == 0 else len(str(k)) - 1
            assert r.depth == expect, (k, r.depth)


class TestLateralTopk:
    def test_matches_window_formulation(self, spark, sf_dir):
        """The LATERAL LIMIT answer must equal the row_number()-window
        top-k computed independently (Spark vs Spark)."""
        from interop_datalake_spark.sources.tables import load_table
        from pyspark.sql import Window

        lat = sorted(
            map(tuple, lateral_topk_orders(spark, sf_dir).collect())
        )
        orders = load_table(spark, sf_dir, "orders")
        cust = load_table(spark, sf_dir, "customer").filter(
            F.col("c_custkey") <= 200
        )
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
        win = (
            orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "o_orderkey", "o_totalprice")
        )
        assert lat == sorted(map(tuple, win.collect()))

    def test_at_most_two_per_customer(self, spark, sf_dir):
        counts = (
            lateral_topk_orders(spark, sf_dir)
            .groupBy("c_custkey")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert counts <= 2

    def test_plan_uses_partial_window_group_limit(self, spark, sf_dir):
        """Catalyst must de-correlate the LATERAL LIMIT into
        WindowGroupLimit with a Partial (pre-shuffle) pass — the
        shuffle then moves k rows per key, not the orders table.
        If this ever regresses to a plain correlated join the query
        stops being scale-safe."""
        plan = lateral_topk_orders(spark, sf_dir)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "WindowGroupLimit" in plan
        assert "Partial" in plan


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _tokens(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestExactSubstring:
    def test_planted_run_exact_length(self, spark):
        """Two docs sharing exactly 15 consecutive tokens report
        max_run_tokens == 15 — not 14, not 16 (the r + k - 1 algebra
        is easy to get off by one)."""
        run = _tokens("s", 15)
        docs = _docs(
            spark,
            [
                _tokens("a", 6) + " " + run + " " + _tokens("b", 6),
                _tokens("c", 6) + " " + run + " " + _tokens("d", 6),
            ],
        )
        rows = exact_substring_pairs(
            docs, "text", "doc_id", k=4, min_tokens=12
        ).collect()
        assert len(rows) == 1
        assert (rows[0].id_a, rows[0].id_b) == (0, 1)
        assert rows[0].max_run_tokens == 15
        assert rows[0].n_runs == 1

    def test_below_threshold_excluded(self, spark):
        run = _tokens("s", 11)  # 11 < min_tokens=12
        docs = _docs(
            spark,
            [
                _tokens("a", 6) + " " + run,
                _tokens("c", 6) + " " + run,
            ],
        )
        assert (
            exact_substring_pairs(
                docs, "text", "doc_id", k=4, min_tokens=12
            ).count()
            == 0
        )

    def test_two_separate_runs_counted(self, spark):
        r1, r2 = _tokens("x", 12), _tokens("y", 20)
        docs = _docs(
            spark,
            [
                r1 + " " + _tokens("a", 8) + " " + r2,
                r1 + " " + _tokens("b", 8) + " " + r2,
            ],
        )
        rows = exact_substring_pairs(
            docs, "text", "doc_id", k=4, min_tokens=12
        ).collect()
        assert len(rows) == 1
        assert rows[0].max_run_tokens == 20
        assert rows[0].n_runs == 2

    def test_hot_gram_cap_suppresses_boilerplate(self, spark):
        """A run shared by MORE than max_gram_freq docs is boilerplate:
        the cap drops its grams before the join, so no pair survives
        on that run alone."""
        run = _tokens("s", 15)
        docs = _docs(spark, [run, run, run])  # df=3 for every gram
        out = exact_substring_pairs(
            docs, "text", "doc_id", k=4, min_tokens=12, max_gram_freq=2
        )
        assert out.count() == 0
        # at cap 3 the same corpus yields all three pairs
        out3 = exact_substring_pairs(
            docs, "text", "doc_id", k=4, min_tokens=12, max_gram_freq=3
        )
        assert out3.count() == 3

    def test_repeated_run_within_one_doc(self, spark):
        """A run appearing TWICE in doc B but once in doc A must not
        inflate the max: each copy matches on its own diagonal."""
        run = _tokens("s", 12)
        docs = _docs(
            spark,
            [
                run + " " + _tokens("a", 6),
                run + " " + _tokens("b", 6) + " " + run,
            ],
        )
        rows = exact_substring_pairs(
            docs, "text", "doc_id", k=4, min_tokens=12
        ).collect()
        assert len(rows) == 1
        assert rows[0].max_run_tokens == 12
        assert rows[0].n_runs == 2  # one per copy in B

    def test_sf001_finds_known_duplicates(self, spark, sf_dir):
        """The synthetic corpus contains near-dup pairs with long
        verbatim spans; the operator must find a stable non-empty set
        that is consistent with the exact-dup pairs (any two docs
        with IDENTICAL text trivially share their full token run)."""
        from interop_datalake_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        pairs = {
            (r.id_a, r.id_b)
            for r in exact_substring_pairs(
                docs, "text", "doc_id", k=4, min_tokens=12
            ).collect()
        }
        assert pairs  # non-empty at sf0.01
        # exact duplicates (same text, long enough, not boilerplate-
        # capped) must appear
        import pyspark.sql.functions as F2

        dup = (
            docs.filter(
                F2.size(F2.split("text", " ")) >= 12
            )
            .groupBy("text")
            .agg(F2.collect_list("doc_id").alias("ids"))
            .filter(F2.size("ids") == 2)  # df=2 < cap=50
            .collect()
        )
        for r in dup:
            a, b = sorted(r.ids)
            assert (a, b) in pairs, f"exact dup pair ({a},{b}) missed"
