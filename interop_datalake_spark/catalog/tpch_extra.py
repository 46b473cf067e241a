"""Additional TPC-H-adapted queries over the synthetic star schema —
the multi-join / conditional-aggregation / having-clause workload
(Q7/Q10/Q14/Q18/Q19 analogs, adapted to the driver testdata columns).

Scale commentary: fixed-size dims (nation) broadcast explicitly;
SF-scaled tables (customer/supplier/part) get NO broadcast hint — AQE
broadcasts them while they fit and shuffle-joins them at 100× (a forced
hint would override AQE's size check and OOM the executors). Money
aggregates follow the decimal-sum determinism policy
(functions/money.py). Conditional aggregation (q14) is a single scan;
the having-clause query (q18) is agg→filter→join back to the facts —
no plan materializes an intermediate wider than its final projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.functions.fixedpoint import (
    exact_ratio,
    sql_exact_ratio,
)
from interop_datalake_spark.functions.money import (
    RATE,
    money,
    money_sum,
    one_minus,
)
from interop_datalake_spark.sources.tables import load_table


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between customer-nation and supplier-nation pairs
    per year (Q7 analog)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        # decimal sum: exact and order-independent, so the HAVING filter
        # on the rounded value can't flip group membership between
        # engines (round-1 failure: 4/1445 groups off by 0.01)
        .agg(
            money_sum(money("l_extendedprice") * one_minus("l_discount")).alias(
                "volume"
            )
        )
        .filter(F.col("volume") > 500000)
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


Q7_ORACLE = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       year(l_shipdate) AS ship_year,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
HAVING round(sum(l_extendedprice::DECIMAL(12,2)
               * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE > 500000
ORDER BY cust_nation, supp_nation, ship_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns (Q10 analog)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(money("l_extendedprice") * one_minus("l_discount")).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO parts per month (Q14 analog —
    conditional aggregation in one scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = money("l_extendedprice") * one_minus("l_discount")
    promo = F.when(F.col("p_type") == "PROMO", rev)
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return (
        joined.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            money_sum(promo).alias("promo_revenue"),
            money_sum(rev).alias("total_revenue"),
            # ratio of the two deterministic doubles — no outer round
            (money_sum(promo) / money_sum(rev)).alias("promo_share"),
        )
        .orderBy("ship_month")
    )


Q14_ORACLE = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       round(sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice::DECIMAL(12,2)
                           * (1 - l_discount::DECIMAL(3,2)) END), 2)::DOUBLE AS promo_revenue,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE               AS total_revenue,
       round(sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice::DECIMAL(12,2)
                           * (1 - l_discount::DECIMAL(3,2)) END), 2)::DOUBLE
         / round(sum(l_extendedprice::DECIMAL(12,2)
                     * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE           AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY strftime(l_shipdate, '%Y-%m')
ORDER BY ship_month
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with any order whose total quantity exceeds 210
    (Q18 analog: agg → HAVING → join back)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 210)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity), 2) > 210
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""


def q19_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-AND predicate brackets across the join (Q19 analog):
    Catalyst pushes the common l/p predicates below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    bracket1 = (
        (F.col("p_type") == "SMALL")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 20))
    )
    bracket2 = (
        (F.col("p_type") == "LARGE")
        & (F.col("p_size").between(10, 40))
        & (F.col("l_quantity").between(20, 40))
    )
    return j.filter(bracket1 | bracket2).agg(
        F.count("*").alias("n_items"),
        money_sum(money("l_extendedprice") * one_minus("l_discount")).alias(
            "revenue"
        ),
    )


Q19_ORACLE = """
SELECT count(*) AS n_items,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_type = 'SMALL' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_type = 'LARGE' AND p_size BETWEEN 10 AND 40
       AND l_quantity BETWEEN 20 AND 40)
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 analog (order-priority checking): per (quarter, priority),
    count orders with ≥1 late line (l_shipdate > o_orderdate + 7 days
    — the testdata's analog of commitdate-vs-receiptdate lateness).
    The EXISTS becomes a LEFT SEMI join: the lineitem side reduces to
    the distinct late order keys BEFORE the join, so the shuffle
    carries one row per late order, not one per late line."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")
        )
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy(
            F.date_trunc("quarter", "o_orderdate").cast("date").alias("qtr"),
            "o_orderpriority",
        )
        .agg(F.count("*").alias("order_count"))
        .orderBy("qtr", "o_orderpriority")
    )


Q4_ORACLE = """
WITH late AS (
  SELECT DISTINCT l.l_orderkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 7 DAY
)
SELECT date_trunc('quarter', o_orderdate)::DATE AS qtr,
       o_orderpriority, count(*) AS order_count
FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM late)
GROUP BY 1, 2 ORDER BY qtr, o_orderpriority
"""


def q12_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analog (shipping-mode priority check, re-keyed on ship
    delay because the testdata has no l_shipmode): lines bucketed by
    o_orderdate→l_shipdate delay (≤30d 'fast', else 'slow'), counting
    high- vs low-priority orders per bucket — the classic conditional
    aggregation over a fact-dim join, one scan, no CASE explosion."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30,
                "fast",
            )
            .otherwise("slow")
            .alias("delay_bucket"),
            is_high.cast("int").alias("high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum("high").alias("high_priority_lines"),
            F.sum(1 - F.col("high")).alias("low_priority_lines"),
        )
        .orderBy("delay_bucket")
    )


Q12_ORACLE = """
SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30
            THEN 'fast' ELSE 'slow' END AS delay_bucket,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_priority_lines,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_priority_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY delay_bucket
"""


def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (the A-priori pair pass):
    orders are baskets, parts are items; co-occurring part pairs get
    support count and LIFT = P(a,b)/(P(a)·P(b)) — the classic
    bought-together analysis.

    Scale shape: the within-basket self-join costs Σ|basket|² — bounded
    by line-per-order limits, NOT corpus size (the same bounded-group
    argument as SemDeDup's clusters); item frequencies are
    vocabulary-sized and broadcast; min-support (≥2) prunes the pair
    tail BEFORE the stats join. Lift is a ratio of exact BIGINTs
    rounded at 6 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    return pair_lift(items, "l_orderkey", "l_partkey", min_support=2).orderBy(
        "pa", "pb"
    )


def pair_lift(
    items: DataFrame, basket_col: str, item_col: str, min_support: int = 2
) -> DataFrame:
    """Reusable core of :func:`basket_pair_lift` over a distinct
    (basket, item) frame. The frame feeds FOUR consumers (frequencies,
    both self-join sides, the basket-count scalar) — materialized once;
    the scalar rides as a broadcast 1-row crossJoin, never a driver
    collect (the bm25_scores convention)."""
    items = items.localCheckpoint()
    nb = items.agg(
        F.count_distinct(basket_col).alias("_n_baskets")
    )
    freq = items.groupBy(item_col).agg(F.count("*").alias("n_item"))
    b = items.select(
        F.col(basket_col).alias("o2"), F.col(item_col).alias("pb")
    )
    pairs = (
        items.join(
            b,
            (items[basket_col] == b.o2) & (items[item_col] < b.pb),
        )
        .groupBy(F.col(item_col).alias("pa"), "pb")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= min_support)
    )
    fa = freq.select(
        F.col(item_col).alias("pa"), F.col("n_item").alias("n_a")
    )
    fb = freq.select(
        F.col(item_col).alias("pb"), F.col("n_item").alias("n_b")
    )
    from interop_datalake_spark.functions.fixedpoint import exact_ratio

    # lift is a pure integer ratio n_pair·N / (n_a·n_b): computed as
    # an exact half-up micro-unit division, never round(double, 6) —
    # an integer ratio CAN land exactly half-way on the 6-dp grid
    # (e.g. denominators of the form 2^7·5^j), the ewma red-row class
    return (
        pairs.join(F.broadcast(fa), "pa")
        .join(F.broadcast(fb), "pb")
        .crossJoin(F.broadcast(nb))
        .select(
            "pa", "pb", "n_pair", "n_a", "n_b",
            exact_ratio(
                F.col("n_pair") * F.col("_n_baskets"),
                F.col("n_a") * F.col("n_b"),
            ).alias("lift"),
        )
    )


BASKET_LIFT_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), nb AS (
  SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM items
), freq AS (
  SELECT l_partkey, count(*) AS n_item FROM items GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_pair
  FROM items a
  JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
)
SELECT p.pa, p.pb, p.n_pair, fa.n_item AS n_a, fb.n_item AS n_b,
       {sql_exact_ratio('p.n_pair * (SELECT n FROM nb)',
                        'fa.n_item * fb.n_item')} AS lift
FROM pairs p
JOIN freq fa ON fa.l_partkey = p.pa
JOIN freq fb ON fb.l_partkey = p.pb
ORDER BY pa, pb
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 analog (customer order-count distribution): how many
    customers placed exactly N qualifying orders, INCLUDING the
    zero-order customers — the canonical outer-join-then-double-agg
    decorrelation shape. The qualifying predicate lives in the join
    condition (not WHERE): filtering the right side before a LEFT
    OUTER join is the only placement that keeps orderless customers.
    count(o_orderkey) counts non-null matches, so unmatched customers
    land in the c_count=0 bucket."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(
            orders, cust.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 analog (small-quantity-order revenue): yearly revenue lost
    if orders below 20% of a part's average quantity went unshipped —
    the classic correlated-scalar-average decorrelation: the per-part
    subquery becomes one aggregate over the SAME filtered join feed,
    joined back on the correlation key.

    Determinism: ``l_quantity < 0.2 * avg(l_quantity)`` compared in
    doubles is a knife edge (a float avg is partial-order dependent).
    Quantities are 2-dp exact, so the predicate is evaluated in exact
    integers instead: 5·qty_centi·n < Σqty_centi — identical group
    membership in any engine, no float ever compared."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # SF-scaled part gets no broadcast hint (module policy) — AQE
    # broadcasts the post-filter side while it fits
    pf = part.filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    qc = F.round(F.col("l_quantity") * 100).cast("bigint")
    feed = li.join(pf, li.l_partkey == pf.p_partkey).select(
        "l_partkey", "l_extendedprice", qc.alias("qty_centi")
    )
    stats = feed.groupBy("l_partkey").agg(
        F.sum("qty_centi").alias("sum_centi"),
        F.count("*").alias("n_li"),
    )
    return (
        feed.join(stats, "l_partkey")
        .filter(
            F.lit(5) * F.col("qty_centi") * F.col("n_li")
            < F.col("sum_centi")
        )
        .agg(
            (money_sum(money("l_extendedprice")) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


Q17_ORACLE = """
WITH feed AS (
  SELECT l_partkey, l_extendedprice,
         round(l_quantity * 100)::BIGINT AS qty_centi
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
), stats AS (
  SELECT l_partkey, sum(qty_centi)::BIGINT AS sum_centi,
         count(*)::BIGINT AS n_li
  FROM feed GROUP BY l_partkey
)
SELECT round(sum(f.l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE / 7.0
         AS avg_yearly
FROM feed f JOIN stats s ON f.l_partkey = s.l_partkey
WHERE 5 * f.qty_centi * s.n_li < s.sum_centi
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 analog (suppliers who kept orders waiting): late lines
    (ship > order date + 30d, the testdata's receipt-vs-commit
    analog) in finished orders, where ANOTHER supplier shipped a line
    of the same order (EXISTS → left-semi with a non-equi suppkey
    guard on the orderkey equi-join) and NO other supplier was also
    late (NOT EXISTS → left-anti, same shape) — the classic
    multi-EXISTS decorrelation stress test. The order-scoped line feed
    is built ONCE (lineitem ⋈ finished orders, lateness derived from
    the order's own date) and serves all three roles; both subqueries
    stay equi-keyed on l_orderkey, so neither EXISTS degenerates to a
    cartesian (plan-asserted in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    fo = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lo = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(fo, li.l_orderkey == fo.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ).alias("late"),
        )
    )
    l1 = lo.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = lo.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        lo.filter(F.col("late"))
        .select(
            F.col("l_orderkey").alias("o3"),
            F.col("l_suppkey").alias("s3"),
        )
    )
    waiting = l1.join(
        l2,
        (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == l3.o3) & (F.col("l_suppkey") != l3.s3),
        "left_anti",
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders o
WHERE s_suppkey = l1.l_suppkey
  AND o.o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q20_semi_chain_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog (potential part promotion — adapted: the testdata
    has no partsupp, so availqty's role is played by a per-(supplier,
    part) shipped-quantity threshold): suppliers in a nation window
    that shipped >50 total units of some promo-class part — a
    NESTED-SEMI CHAIN (supplier ← semi ← grouped lineitem ← semi ←
    filtered part) where each inner level reduces before joining:
    part filters to a key set, lineitem groups to (supp, part) sums
    BEFORE the HAVING, and supplier semi-joins the surviving supplier
    keys — no level materializes wider than its keys."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    # nation names are synthetic NATION_0..NATION_24: the window
    # 'n_name < NATION_2' keeps 12 of 25 nations (round-10 review:
    # a real-world name literal matched NOTHING, making the query —
    # and its oracle — vacuously empty)
    promo_parts = part.filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    heavy = (
        li.join(promo_parts, li.l_partkey == promo_parts.p_partkey,
                "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") < "NATION_2")
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name < 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (
      SELECT p_partkey FROM part WHERE p_type = 'PROMO'
    )
    GROUP BY l_suppkey, l_partkey
    HAVING round(sum(l_quantity), 2) > 50
  )
ORDER BY s_suppkey
"""


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analog (global sales opportunity): per nation-derived
    country code, the count and balance mass of ABOVE-AVERAGE-balance
    customers with no URGENT orders (every testdata customer has
    SOME order — round-10 review: the literal no-orders predicate was
    vacuously empty, so the anti-join arm never executed on data) —
    scalar-average subquery (decorrelated to one global aggregate) +
    NOT EXISTS (left-anti on the filtered order keys,
    distinct-reduced before the join).

    Determinism: ``c_acctbal > avg(c_acctbal)`` in doubles is the
    float-knife-edge class (a float avg is partial-order dependent);
    balances are 2-dp exact, so membership compares exact integers —
    bal_centi · n > Σbal_centi (the q17 rule)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal_centi = F.round(F.col("c_acctbal") * 100).cast("bigint")
    pos = cust.filter(F.col("c_acctbal") > 0.0)
    stats = pos.agg(
        F.sum(bal_centi).alias("sum_centi"),
        F.count("*").alias("n_pos"),
    )
    has_order = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.withColumn("bal_centi", bal_centi)
        .crossJoin(F.broadcast(stats))
        .filter(
            F.col("bal_centi") * F.col("n_pos") > F.col("sum_centi")
        )
        .join(
            has_order, cust.c_custkey == has_order.o_custkey,
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            money_sum(money("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_ORACLE = """
WITH stats AS (
  SELECT sum(round(c_acctbal * 100)::BIGINT)::BIGINT AS sum_centi,
         count(*)::BIGINT AS n_pos
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey % 5 AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal::DECIMAL(12,2)), 2)::DOUBLE AS totacctbal
FROM customer, stats
WHERE round(c_acctbal * 100)::BIGINT * n_pos > sum_centi
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey % 5
ORDER BY cntrycode
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (forecasting revenue change) — the canonical
    pushdown-everything query: three range predicates and one
    aggregate, no join. All three predicates must reach the parquet
    scan (plan-asserted in tests/test_plans.py); revenue is the exact
    decimal fold. Discount literals compare doubles against the same
    stored doubles in both engines — bit-identical parses, no knife
    edge."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(
                money("l_extendedprice")
                * F.col("l_discount").cast("decimal(3,2)")
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice::DECIMAL(12,2)
                 * l_discount::DECIMAL(3,2)), 2)::DOUBLE AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 analog (national market share): one supplier nation's share
    of revenue among orders from customers of one region, per ship
    year — the deepest broadcast-dim chain in the set (lineitem ⋈
    orders ⋈ customer ⋈ nation ⋈ REGION on the customer side, ⋈
    supplier ⋈ nation on the supply side). Share is a ratio of two
    decimal-sums (the q14 pattern — deterministic doubles, no outer
    round)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cr_key"),
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = region.filter(F.col("r_name") == "AMERICA").select(
        F.col("r_regionkey").alias("cr_key")
    )
    vol = money("l_extendedprice") * one_minus("l_discount")
    # synthetic nation names (round-10 review: 'BRAZIL' matched none,
    # leaving the market-share numerator NULL everywhere)
    target = F.when(F.col("supp_nation") == "NATION_3", vol)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), "cr_key")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            money_sum(target).alias("target_volume"),
            money_sum(vol).alias("total_volume"),
            (money_sum(target) / money_sum(vol)).alias("mkt_share"),
        )
        .orderBy("ship_year")
    )


Q8_ORACLE = """
SELECT year(l_shipdate) AS ship_year,
       round(sum(CASE WHEN ns.n_name = 'NATION_3'
                      THEN l_extendedprice::DECIMAL(12,2)
                           * (1 - l_discount::DECIMAL(3,2)) END), 2)::DOUBLE
         AS target_volume,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE
         AS total_volume,
       round(sum(CASE WHEN ns.n_name = 'NATION_3'
                      THEN l_extendedprice::DECIMAL(12,2)
                           * (1 - l_discount::DECIMAL(3,2)) END), 2)::DOUBLE
         / round(sum(l_extendedprice::DECIMAL(12,2)
                     * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE
         AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region   ON nc.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
WHERE r_name = 'AMERICA'
GROUP BY year(l_shipdate)
ORDER BY ship_year
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (top supplier — the VIEW + scalar-max shape, the last
    TPC-H analog expressible without partsupp): per-supplier revenue
    over a three-month l_shipdate window, then the supplier(s) whose
    revenue EQUALS the maximum — decorrelated as one global max
    aggregate (a 1-row broadcast) equality-joined back to the
    revenue view, so the plan is scan → partial/final agg → broadcast
    equality join → broadcast supplier join: two shuffles total, no
    re-scan of lineitem for the max. Revenue compares EXACTLY
    (decimal-summed, decimal-rounded — functions/money.py), so the
    max-equality can't straddle a float ulp between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
        )
        .groupBy("l_suppkey")
        .agg(
            money_sum(
                money("l_extendedprice") * one_minus("l_discount")
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(
            F.broadcast(mx), F.col("total_revenue") == F.col("_mx")
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice::DECIMAL(12,2)
                   * (1 - l_discount::DECIMAL(3,2))), 2)::DOUBLE
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "basket_pair_lift": basket_pair_lift,
    "q12_ship_delay": q12_ship_delay,
    "q7_nation_volume": q7_nation_volume,
    "q10_returned_items": q10_returned_items,
    "q14_promo_share": q14_promo_share,
    "q18_large_orders": q18_large_orders,
    "q19_bracket_predicates": q19_bracket_predicates,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
    "q20_semi_chain_suppliers": q20_semi_chain_suppliers,
    "q22_dormant_customers": q22_dormant_customers,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q8_market_share": q8_market_share,
    "q15_top_supplier": q15_top_supplier,
}

ORACLES = {
    "q4_order_priority": Q4_ORACLE,
    "basket_pair_lift": BASKET_LIFT_ORACLE,
    "q12_ship_delay": Q12_ORACLE,
    "q7_nation_volume": Q7_ORACLE,
    "q10_returned_items": Q10_ORACLE,
    "q14_promo_share": Q14_ORACLE,
    "q18_large_orders": Q18_ORACLE,
    "q19_bracket_predicates": Q19_ORACLE,
    "q13_customer_distribution": Q13_ORACLE,
    "q17_small_quantity_revenue": Q17_ORACLE,
    "q21_suppliers_kept_waiting": Q21_ORACLE,
    "q20_semi_chain_suppliers": Q20_ORACLE,
    "q22_dormant_customers": Q22_ORACLE,
    "q6_forecast_revenue": Q6_ORACLE,
    "q8_market_share": Q8_ORACLE,
    "q15_top_supplier": Q15_ORACLE,
}
