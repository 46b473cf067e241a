"""Event-analytics catalog: ordered funnels and cohort retention — the
classic product-analytics operators over the events stream, expressed
as pure aggregation cascades (no per-user iteration anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from interop_datalake_spark.functions.money import money, money_sum
from interop_datalake_spark.sources.tables import load_table, local_frame


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel signup → click → purchase: each step
    counts users whose step event happened AFTER their previous step's
    first occurrence. Three aggregation stages, each shuffling only
    (user_id, ts) pairs."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        local_frame(spark,
            [(1, "signup"), (2, "click_after_signup"), (3, "purchase_after_click")],
            "step INT, step_name STRING",
        )
        .join(
            s.agg(F.count("*").alias("n")).withColumn("step", F.lit(1))
            .unionByName(
                c.agg(F.count("*").alias("n")).withColumn("step", F.lit(2))
            )
            .unionByName(
                p.agg(F.count("*").alias("n")).withColumn("step", F.lit(3))
            ),
            "step",
        )
        .select("step", "step_name", "n")
        .orderBy("step")
    )


FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, min(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t_signup
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step, 'signup' AS step_name, (SELECT count(*) FROM s) AS n
  UNION ALL
  SELECT 2, 'click_after_signup', (SELECT count(*) FROM c)
  UNION ALL
  SELECT 3, 'purchase_after_click', (SELECT count(*) FROM p)
) ORDER BY step
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    counted in each subsequent activity week (the (cohort, offset)
    matrix). Two shuffles: first-seen per user, then the matrix agg."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .withColumn(
            "week_offset",
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            ).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .withColumn("cohort_week", F.col("cohort_week").cast("date"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_ORACLE = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT cohort_week::DATE AS cohort_week,
       (datediff('day', cohort_week::DATE, active_week::DATE) / 7)::INT AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY 1, 2 ORDER BY cohort_week, week_offset
"""


def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (hypertable continuous-aggregate
    analog): one pass produces hourly, daily, and monthly aggregates
    via GROUPING SETS over date_trunc exprs — the engine computes the
    finest level and reuses it map-side rather than re-scanning per
    granularity."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_ht_events")
    return spark.sql(
        """
        SELECT CASE WHEN hour IS NOT NULL THEN 'hour'
                    WHEN day  IS NOT NULL THEN 'day'
                    ELSE 'month' END                      AS granularity,
               coalesce(hour, day, month)                 AS bucket,
               count(*)                                   AS n_events,
               cast(round(sum(cast(value as decimal(12,2))), 2)
                    as double)                            AS total_value
        FROM (
          SELECT date_trunc('hour',  ts) AS hour,
                 date_trunc('day',   ts) AS day,
                 date_trunc('month', ts) AS month,
                 value
          FROM _ht_events
        )
        GROUP BY GROUPING SETS ((hour), (day), (month))
        ORDER BY granularity, bucket
        """
    )


HYPERTABLE_ORACLE = """
SELECT CASE WHEN hour IS NOT NULL THEN 'hour'
            WHEN day  IS NOT NULL THEN 'day'
            ELSE 'month' END                      AS granularity,
       coalesce(hour, day, month)                 AS bucket,
       count(*)                                    AS n_events,
       round(sum(value::DECIMAL(12,2)), 2)::DOUBLE AS total_value
FROM (
  SELECT date_trunc('hour',  ts) AS hour,
         date_trunc('day',   ts) AS day,
         date_trunc('month', ts) AS month,
         value
  FROM events
)
GROUP BY GROUPING SETS ((hour), (day), (month))
ORDER BY granularity, bucket
"""


def revenue_share_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report): each nation's share of
    global revenue — an unpartitioned window, applied AFTER aggregation
    so it spans 25 rows, never the fact table."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(money_sum(money("o_totalprice")).alias("revenue"))
    )
    from pyspark.sql import Window

    from interop_datalake_spark.functions.fixedpoint import exact_ratio

    # the window total re-sums 25 already-rounded doubles: go through
    # decimal again so the grand total is order-independent too, and
    # emit share as an exact 6-dp half-up CENTS ratio — a money ratio
    # is rational and round(double, 6) of it can land exactly half-way
    # on the grid (ewma red-row class)
    w = Window.partitionBy()
    cents = (F.col("revenue").cast("decimal(14,2)") * 100).cast("bigint")
    total_cents = F.sum(cents).over(w)
    return (
        per_nation.withColumn(
            "share", exact_ratio(cents, total_cents)
        )
        .select("n_name", "revenue", "share")
        .orderBy("n_name")
    )


REVENUE_SHARE_ORACLE = """
WITH per_nation AS (
  SELECT n_name, round(sum(o_totalprice::DECIMAL(12,2)), 2)::DOUBLE AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, revenue,
       ((2 * (revenue::DECIMAL(14,2) * 100)::BIGINT * 1000000
           + (sum((revenue::DECIMAL(14,2) * 100)::BIGINT) OVER ()))
        // (2 * (sum((revenue::DECIMAL(14,2) * 100)::BIGINT) OVER ())))
         ::DOUBLE / 1000000.0 AS share
FROM per_nation ORDER BY n_name
"""


def sessionize(ev: DataFrame, gap_us: int = 1_800_000_000) -> DataFrame:
    """Gap-based sessionization core over (user_id, ts, event_id,
    value) rows: a lag window marks session starts (gap > ``gap_us``
    microseconds), a running sum numbers sessions per user, one
    groupBy rolls them up. Exactly one shuffle on user_id serves BOTH
    window passes and the final agg (same partitioning reused across
    stages); no global sort anywhere. Gap math runs in integer
    microseconds (``unix_micros``) so engines agree exactly on
    TIMESTAMP(NANOS)-sourced events; session value totals go through
    the decimal money path."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    new_flag = F.when(
        prev_us.isNull()
        | ((F.unix_micros("ts") - prev_us) > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("_new", new_flag).withColumn(
        "session_no",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("duration_us"),
            money_sum(money(F.col("value"))).alias("total_value"),
        )
        .orderBy("user_id", "session_no")
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch twin of
    stream_session_window's 30-min session): classic gaps-and-islands
    via :func:`sessionize` with a 30-minute gap."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return sessionize(ev)


SESSIONIZE_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS newf
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(newf) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         )::BIGINT AS session_no
  FROM o
)
SELECT user_id, session_no,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
       round(sum(value::DECIMAL(12,2)), 2)::DOUBLE AS total_value
FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no
"""


def events_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct rollup (operators/sketches.py): one
    HLL sketch of user_id per day is appended to a TxnTable sketch
    store; distinct-users-to-date for EVERY day is then a running
    ``hll_union_agg`` over the store — a window over ~KB-sized rows,
    never a re-scan of raw events. Two invariants are asserted
    in-query: (1) the store-merged final estimate agrees with the
    monolithic whole-scan sketch estimate to 2% — the estimator's own
    error scale (bit-equal while sketches stay sparse; around and
    beyond the sparse→dense promotion the union's HLL_8 target drifts,
    measured 1488 vs 1499 at exactly 1500 keys — see
    operators/sketches.py), and
    (2) every day's estimate is within 5% of the exact count, emitted
    as the ``est_ok`` flag the oracle pins to true — 5%, not the
    estimator's nominal 2%, because an emitted boolean must carry a
    wide margin over the measured 0.7% worst-case drift (round-4
    verdict: knife-edge flags in hashed outputs are a red-row class). The exact side
    (first-seen-day reduction + running sum — itself the scalable
    exact pattern) is what DuckDB replays value-for-value."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from interop_datalake_spark.lake.txn import TxnTable
    from interop_datalake_spark.operators.sketches import (
        cumulative_estimates,
        daily_sketches,
    )
    from interop_datalake_spark.session import DatalakeSession

    ev = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="sketch_store_")
    try:
        session = DatalakeSession(lake_root=root, spark=spark)
        store = TxnTable(session, "daily_user_sketches")
        store.append(daily_sketches(ev))
        cum = cumulative_estimates(store.read())

        # invariant 1: rolled-up == monolithic (exact, Spark-vs-Spark)
        merged_final = cum.orderBy(F.desc("day")).limit(1).collect()[0][
            "est_to_date"
        ]
        mono = ev.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
        ).collect()[0]["e"]
        assert abs(merged_final - mono) <= 0.02 * mono, (merged_final, mono)

        first = ev.groupBy("user_id").agg(
            F.min(F.date_trunc("day", "ts")).alias("day")
        )
        newk = first.groupBy("day").agg(F.count("*").alias("new_keys"))
        w = (
            Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            cum.join(newk, "day", "left")
            .na.fill({"new_keys": 0})
            .select(
                "day",
                "n_events",
                F.sum("new_keys").over(w).alias("exact_to_date"),
                "est_to_date",
            )
            .select(
                F.col("day").cast("date").alias("day"),
                "n_events",
                "exact_to_date",
                # 5% margin, ≥7× the 0.7% drift measured at the
                # sparse→dense promotion (round-4 verdict: a 2% margin
                # left a knife-edge boolean in a hashed output column)
                (
                    F.abs(F.col("est_to_date") - F.col("exact_to_date"))
                    <= 0.05 * F.col("exact_to_date")
                ).alias("est_ok"),
            )
            .orderBy("day")
        )
        rows = out.collect()  # detach from the scratch store before rmtree
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return local_frame(spark,
        rows, "day DATE, n_events BIGINT, exact_to_date BIGINT, est_ok BOOLEAN"
    ).orderBy("day")


DISTINCT_ROLLUP_ORACLE = """
WITH days AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n_events
  FROM events GROUP BY 1
), first AS (
  SELECT user_id, min(date_trunc('day', ts)) AS day
  FROM events GROUP BY user_id
), newk AS (
  SELECT day, count(*) AS new_keys FROM first GROUP BY day
)
SELECT d.day::DATE AS day, d.n_events,
       -- ::BIGINT: DuckDB windowed sum yields HUGEINT (round-4
       -- driver-red class; tests/oracle.py type whitelist)
       sum(coalesce(k.new_keys, 0)) OVER (ORDER BY d.day)::BIGINT
         AS exact_to_date,
       true AS est_ok
FROM days d LEFT JOIN newk k USING (day)
ORDER BY day
"""


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average over the DAILY
    value series (α = 0.3, seeded at the first observation) — the
    classic smoothing recursion ewma_i = α·x_i + (1−α)·ewma_{i−1},
    computed WITHOUT a UDF: each user's ordered series becomes one
    array (sort_array ∘ collect_list), and ``F.aggregate`` folds it
    left-to-right emitting every intermediate smoothed value, which
    posexplode turns back into rows.

    Float discipline (the round-4 driver-red fix): the round-3 version
    folded with ``F.round(0.3·x + 0.7·prev, 6)`` on DOUBLEs, and
    Spark's BigDecimal HALF_UP disagreed with DuckDB's float round on
    27/4006 representation-boundary rows, the recursion carrying each
    flip forward. The fold now runs ENTIRELY in BIGINT micro-units —
    e_i = div_half_up(3·x_i + 7·e_{i−1}, 10), exact integer HALF_UP
    (functions/fixedpoint.py) — so a divergent step is structurally
    impossible; the only doubles are the final cast-and-divide, one
    correctly-rounded IEEE op identical in both engines.

    Scale shape: one shuffle (the per-user daily agg doubles as the
    collect grouping); the fold is JVM codegen over an array bounded
    by the series length (30 here, 365 for a year of days) — far below
    array limits; for unbounded/high-frequency series, segment the
    fold per month and chain segment seeds, same algebra."""
    from interop_datalake_spark.functions.fixedpoint import div_half_up

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
        .cast("bigint")
        .alias("xc")  # exact cents
    )
    arr = daily.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("day", "xc"))).alias("s")
    )
    ewmas = arr.select(
        "user_id",
        "s",
        # accumulator and every step in BIGINT micro-units
        F.aggregate(
            F.slice("s", 2, F.greatest(F.size("s") - 1, F.lit(0))),
            F.array(
                (F.element_at(F.col("s"), 1)["xc"] * 10000).cast("bigint")
            ),
            lambda acc, e: F.concat(
                acc,
                F.array(
                    div_half_up(
                        3 * e["xc"] * 10000 + 7 * F.element_at(acc, -1),
                        F.lit(10),
                    )
                ),
            ),
        ).alias("e"),
    )
    return (
        ewmas.select(
            "user_id", F.posexplode(F.arrays_zip("s", "e")).alias("i", "z")
        )
        .select(
            "user_id",
            F.col("z.s.day").cast("date").alias("day"),
            (F.col("z.s.xc").cast("double") / F.lit(100.0)).alias("x"),
            (F.col("z.e").cast("double") / F.lit(1000000.0)).alias("ewma"),
        )
        .orderBy("user_id", "day")
    )


EWMA_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         (sum(value::DECIMAL(12,2)) * 100)::BIGINT AS xc
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT user_id, day, xc,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS i
  FROM daily
), rec AS (
  SELECT user_id, day, xc, i, xc * 10000 AS em FROM idx WHERE i = 1
  UNION ALL
  SELECT s.user_id, s.day, s.xc, s.i,
         CASE WHEN (3 * s.xc * 10000 + 7 * r.em) >= 0
              THEN (2 * (3 * s.xc * 10000 + 7 * r.em) + 10) // 20
              ELSE -((-2 * (3 * s.xc * 10000 + 7 * r.em) + 10) // 20)
         END AS em
  FROM idx s JOIN rec r ON s.user_id = r.user_id AND s.i = r.i + 1
)
SELECT user_id, day::DATE AS day,
       (xc::DOUBLE) / 100.0 AS x,
       (em::DOUBLE) / 1000000.0 AS ewma
FROM rec ORDER BY user_id, day
"""


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (d=4 rows × w=4096
    counters) — the frequency-sketch sibling of the HLL distinct
    rollup: fixed-size mergeable state no matter how large the event
    stream.

    The sketch build is a plain groupBy over (row, cell): every
    executor's map-side partial aggregation IS the per-partition local
    sketch, and the shuffle moves at most d·w rows *per partition* —
    cell-wise addition is exactly CMS mergeability, so Spark's partial
    agg machinery implements the distributed sketch for free. Point
    estimates take the min over the d cells a key hashes to
    (md5-derived row-salted hashes, portable to the oracle), which can
    only OVER-count (collisions add, never subtract) — the
    ``no_undercount`` invariant column the oracle pins true.

    At 100 TB the counters table is still d·w = 16,384 rows; the estimate side
    here scans distinct keys only to *witness* the error bound — a
    production heavy-hitter query broadcasts the counters and filters
    candidate keys map-side with zero extra shuffles."""
    D, W = 4, 4096
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cell = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("j"), F.col("user_id"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % W
    )
    cells = ev.select(
        "user_id",
        F.explode(F.array(*[F.lit(j) for j in range(D)])).alias("j"),
    ).withColumn("c", cell)
    counters = cells.groupBy("j", "c").agg(F.count("*").alias("n"))
    keys = (
        ev.distinct()
        .select(
            "user_id",
            F.explode(F.array(*[F.lit(j) for j in range(D)])).alias("j"),
        )
        .withColumn("c", cell)
    )
    est = (
        keys.join(F.broadcast(counters), ["j", "c"])
        .groupBy("user_id")
        .agg(F.min("n").alias("est_n"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    return (
        est.join(exact, "user_id")
        .filter(F.col("est_n") >= 80)
        .select(
            "user_id",
            "exact_n",
            "est_n",
            (F.col("est_n") >= F.col("exact_n")).alias("no_undercount"),
        )
        .orderBy(F.desc("est_n"), "user_id")
    )


HEAVY_HITTERS_ORACLE = """
WITH ev AS (SELECT user_id FROM events),
js AS (SELECT unnest([0, 1, 2, 3]) AS j),
cells AS (
  SELECT j,
         ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR), 1, 8))
           ::BIGINT % 4096 AS c
  FROM ev CROSS JOIN js
), counters AS (
  SELECT j, c, count(*) AS n FROM cells GROUP BY j, c
), keys AS (
  SELECT user_id, j,
         ('0x' || substr(md5(j::VARCHAR || ':' || user_id::VARCHAR), 1, 8))
           ::BIGINT % 4096 AS c
  FROM (SELECT DISTINCT user_id FROM ev) CROSS JOIN js
), est AS (
  SELECT k.user_id, min(t.n) AS est_n
  FROM keys k JOIN counters t ON t.j = k.j AND t.c = k.c
  GROUP BY k.user_id
), exact AS (
  SELECT user_id, count(*) AS exact_n FROM ev GROUP BY user_id
)
SELECT e.user_id, x.exact_n, e.est_n, e.est_n >= x.exact_n AS no_undercount
FROM est e JOIN exact x ON x.user_id = e.user_id
WHERE e.est_n >= 80
ORDER BY e.est_n DESC, e.user_id
"""


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the per-type daily revenue series:
    median + MAD (median absolute deviation) instead of mean + stddev,
    so the detector's own baseline is not dragged by the outliers it
    hunts (one large day shifts a mean; it cannot shift a median).
    Flags days where |x − med| > 2.0·1.4826·MAD (1.4826 = the
    normal-consistency constant making MAD comparable to σ).

    Shape: two grouped exact-median aggregations over the (type, day)
    rollup — the rollup is the only fact-table shuffle; the per-type
    stats frame is |types| rows and broadcasts back. Daily totals are
    summed as DECIMAL then 2-dp rounded, med/MAD 6-dp rounded, so the
    DuckDB oracle replays every comparison on identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total")
    )
    med = daily.groupBy("event_type").agg(
        F.round(F.median("total"), 6).alias("med")
    )
    mad = (
        daily.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.median(F.abs(F.col("total") - F.col("med"))), 6)
            .alias("mad")
        )
    )
    from interop_datalake_spark.functions.fixedpoint import (
        div_half_up,
        micros_to_double,
    )

    # totals sit on the cent grid and med/mad on the quarter-cent
    # (k/400) grid, so z = 0.6745·d/mad is RATIONAL and round(double,
    # 6) of it can land exactly half-way (ewma red-row class). Compute
    # in exact integer quarter-cent units instead: z_micro =
    # div_half_up(6745·d4·100, m4) with d4 = 400·(total−med),
    # m4 = 400·mad — the ×400 products are near-integers (grid
    # values), so the 0-dp round is a deterministic integer snap.
    d4 = F.round((F.col("total") - F.col("med")) * 400, 0).cast("bigint")
    m4 = F.round(F.col("mad") * 400, 0).cast("bigint")
    z = F.when(
        F.col("mad") != 0.0,
        micros_to_double(div_half_up(6745 * d4 * 100, m4)),
    )
    return (
        daily.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            F.col("day").cast("date").alias("day"),
            "total",
            "med",
            "mad",
            z.alias("robust_z"),
            (
                F.abs(F.col("total") - F.col("med"))
                > 2.0 * 1.4826 * F.col("mad")
            ).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


ANOMALY_MAD_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         round(sum(value::DECIMAL(12,2)), 2)::DOUBLE AS total
  FROM events GROUP BY 1, 2
), meds AS (
  SELECT event_type, round(median(total), 6) AS med FROM daily GROUP BY 1
), mads AS (
  SELECT d.event_type, round(median(abs(d.total - s.med)), 6) AS mad
  FROM daily d JOIN meds s USING (event_type) GROUP BY 1
)
SELECT d.event_type, d.day::DATE AS day, d.total, s.med, m.mad,
       -- exact integer quarter-cent z (see the Spark twin): rational
       -- ratios under round(double, 6) are the ewma red-row class
       CASE WHEN m.mad <> 0.0 THEN
         (CASE WHEN 6745 * round((d.total - s.med) * 400)::BIGINT >= 0
               THEN (2 * 6745 * round((d.total - s.med) * 400)::BIGINT * 100
                       + round(m.mad * 400)::BIGINT)
                    // (2 * round(m.mad * 400)::BIGINT)
               ELSE -((-2 * 6745 * round((d.total - s.med) * 400)::BIGINT * 100
                       + round(m.mad * 400)::BIGINT)
                    // (2 * round(m.mad * 400)::BIGINT))
          END)::DOUBLE / 1000000.0
       END AS robust_z,
       abs(d.total - s.med) > 2.0 * 1.4826 * m.mad AS is_anomaly
FROM daily d JOIN meds s USING (event_type) JOIN mads m USING (event_type)
ORDER BY event_type, day
"""


def events_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantiles — the third sketch family next to
    the HLL distinct rollup and the CMS heavy hitters: a fixed
    128-bin × width-5 equi-width histogram of ``value`` per day (last
    bin clamps overflow), whose bin counts ADD — per-partition partial
    aggregation is the distributed sketch merge, and the all-time
    histogram is literally the sum of the daily ones (the 'all' scope
    row here, built by re-aggregating daily bins, never re-scanning
    events). p50/p95 come from linear interpolation inside the
    covering bin; the ``err_ok`` invariant pins |est − exact| ≤ one
    bin width against the engine's exact percentile.

    At 100 TB the state per scope is ≤128 integers regardless of event
    volume — the classic trade: one bounded-error merge-safe pass vs
    an exact percentile's full sort/shuffle."""
    from pyspark.sql import Window

    W, NB = 5.0, 128
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        F.date_trunc("day", "ts").cast("date").cast("string").alias("scope"),
        F.least(
            F.floor(F.col("value") / W).cast("int"), F.lit(NB - 1)
        ).alias("bin"),
        "value",
    )
    daily = binned.groupBy("scope", "bin").agg(F.count("*").alias("cnt"))
    # the merge: all-time histogram = sum of daily bin counts
    allb = daily.groupBy("bin").agg(F.sum("cnt").alias("cnt")).select(
        F.lit("all").alias("scope"), "bin", "cnt"
    )
    bins = daily.unionByName(allb)
    w = Window.partitionBy("scope").orderBy("bin")
    cum = bins.select(
        "scope", "bin", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(Window.partitionBy("scope")).alias("n"),
    )

    from interop_datalake_spark.functions.fixedpoint import (
        div_half_up,
        micros_to_double,
    )

    def est(q):
        # interpolated estimate as exact micro-units: est = 5·bin +
        # 5·(q·n − cum_prev)/cnt is RATIONAL, and round(double, 6) of
        # a rational can land exactly half-way on the grid (ewma red
        # class). With q = p/100: est_micro = 5e6·bin +
        # div_half_up(5e4·(p·n − 100·cum_prev), cnt), all BIGINT.
        p = int(q * 100)
        target = F.lit(q) * F.col("n")
        hit = cum.filter(F.col("cum") >= target)
        first = hit.groupBy("scope").agg(F.min("bin").alias("bin"))
        return (
            first.join(cum, ["scope", "bin"])
            .select(
                "scope",
                micros_to_double(
                    F.col("bin") * 5000000
                    + div_half_up(
                        F.lit(50000)
                        * (
                            F.lit(p) * F.col("n")
                            - F.lit(100) * F.col("cum_prev")
                        ),
                        F.col("cnt"),
                    )
                ).alias(f"p{p}_est"),
            )
        )

    exact_day = binned.groupBy("scope").agg(
        F.count("*").alias("n_events"),
        F.round(F.percentile("value", 0.5), 6).alias("p50_exact"),
        F.round(F.percentile("value", 0.95), 6).alias("p95_exact"),
    )
    exact_all = binned.groupBy().agg(
        F.count("*").alias("n_events"),
        F.round(F.percentile("value", 0.5), 6).alias("p50_exact"),
        F.round(F.percentile("value", 0.95), 6).alias("p95_exact"),
    ).select(F.lit("all").alias("scope"), "n_events", "p50_exact", "p95_exact")
    exact = exact_day.unionByName(exact_all)
    return (
        exact.join(est(0.5), "scope")
        .join(est(0.95), "scope")
        .select(
            "scope", "n_events", "p50_est", "p50_exact",
            "p95_est", "p95_exact",
            (
                (F.abs(F.col("p50_est") - F.col("p50_exact")) <= W)
                & (F.abs(F.col("p95_est") - F.col("p95_exact")) <= W)
            ).alias("err_ok"),
        )
        .orderBy("scope")
    )


QUANTILE_ROLLUP_ORACLE = """
WITH binned AS (
  SELECT date_trunc('day', ts)::DATE::VARCHAR AS scope,
         least(floor(value / 5.0)::INT, 127) AS bin, value
  FROM events
), daily AS (
  SELECT scope, bin, count(*) AS cnt FROM binned GROUP BY scope, bin
), bins AS (
  SELECT scope, bin, cnt FROM daily
  UNION ALL
  SELECT 'all', bin, sum(cnt) FROM daily GROUP BY bin
), cum AS (
  SELECT scope, bin, cnt,
         sum(cnt) OVER (PARTITION BY scope ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY scope ORDER BY bin) - cnt AS cum_prev,
         sum(cnt) OVER (PARTITION BY scope) AS n
  FROM bins
), e50 AS (
  -- exact micro-unit interpolation (see the Spark twin): the rational
  -- estimate under round(double, 6) is the ewma red-row class
  SELECT c.scope,
         (c.bin * 5000000
          + (2 * 50000 * (50 * c.n::BIGINT - 100 * c.cum_prev::BIGINT)
               + c.cnt) // (2 * c.cnt))::DOUBLE / 1000000.0
           AS p50_est
  FROM cum c
  JOIN (SELECT scope, min(bin) AS bin FROM cum
        WHERE cum >= 0.5 * n GROUP BY scope) f
    ON f.scope = c.scope AND f.bin = c.bin
), e95 AS (
  SELECT c.scope,
         (c.bin * 5000000
          + (2 * 50000 * (95 * c.n::BIGINT - 100 * c.cum_prev::BIGINT)
               + c.cnt) // (2 * c.cnt))::DOUBLE / 1000000.0
           AS p95_est
  FROM cum c
  JOIN (SELECT scope, min(bin) AS bin FROM cum
        WHERE cum >= 0.95 * n GROUP BY scope) f
    ON f.scope = c.scope AND f.bin = c.bin
), exact AS (
  SELECT scope, count(*) AS n_events,
         round(quantile_cont(value, 0.5), 6) AS p50_exact,
         round(quantile_cont(value, 0.95), 6) AS p95_exact
  FROM binned GROUP BY scope
  UNION ALL
  SELECT 'all', count(*),
         round(quantile_cont(value, 0.5), 6),
         round(quantile_cont(value, 0.95), 6)
  FROM binned
)
SELECT x.scope, x.n_events, a.p50_est, x.p50_exact, b.p95_est, x.p95_exact,
       abs(a.p50_est - x.p50_exact) <= 5.0
         AND abs(b.p95_est - x.p95_exact) <= 5.0 AS err_ok
FROM exact x
JOIN e50 a ON a.scope = x.scope
JOIN e95 b ON b.scope = x.scope
ORDER BY x.scope
"""


def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ROBUST baseline: trailing-7-CALENDAR-DAY median of each
    type's daily revenue (exact percentile as a WINDOW aggregate — a
    moving median a mean-based rolling average can't give), plus a
    spike flag for days ≥ 1.5× their trailing baseline. The frame is
    RANGE over day ordinals, not ROWS over observations: a type that
    goes quiet for a month does NOT get a baseline stitched from
    months-old rows (the ROWS-frame footgun). The window runs over the
    daily rollup (≤ |types|·|days| rows), never the raw events — the
    fact table is touched once by the rollup."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total")
    )
    day_ord = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(day_ord)
        .rangeBetween(-6, 0)
    )
    med = F.round(F.percentile("total", 0.5).over(w), 6)
    return (
        daily.select(
            "event_type",
            F.col("day").cast("date").alias("day"),
            "total",
            med.alias("rolling_med"),
            (F.col("total") >= 1.5 * med).alias("is_spike"),
        )
        .orderBy("event_type", "day")
    )


ROLLING_MEDIAN_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         round(sum(value::DECIMAL(12,2)), 2)::DOUBLE AS total
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, day, total,
         round(median(total) OVER (
           PARTITION BY event_type
           ORDER BY datediff('day', DATE '2024-01-01', day)
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
         ), 6) AS rolling_med
  FROM daily
)
SELECT event_type, day::DATE AS day, total, rolling_med,
       total >= 1.5 * rolling_med AS is_spike
FROM r ORDER BY event_type, day
"""


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z-test per event_type — the hypothesis-testing
    operator class: users deterministically assigned to arms by
    user_id parity (in production: the content-hash bucket, same trick
    as the train/val split), per-arm mean/variance from DECIMAL sums
    of value and value² (a float sum-of-squares is order-dependent in
    its last ulp; value has 2 dp so value² has 4 — both sum exactly),
    Welch z = (m_a − m_b)/√(v_a/n_a + v_b/n_b), |z| > 1.96 flags the
    5% level. One scan, one map-side-combinable aggregation per arm —
    the moments are the only shuffled state, so the test costs the
    same at 100 TB as a count."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
    v = F.col("value").cast("decimal(12,2)")
    per_arm = (
        ev.select("event_type", arm.alias("arm"), v.alias("v"))
        .groupBy("event_type", "arm")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s1"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
        )
    )
    a = per_arm.filter(F.col("arm") == "A").select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("s1").alias("s1_a"),
        F.col("s2").alias("s2_a"),
    )
    b = per_arm.filter(F.col("arm") == "B").select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("s1").alias("s1_b"),
        F.col("s2").alias("s2_b"),
    )

    def mean(s, n):
        return s.cast("double") / n

    def var(s2, s1, n):
        # unbiased: (Σx² − (Σx)²/n) / (n−1), decimal numerators
        return (
            s2.cast("double") - s1.cast("double") ** 2 / n
        ) / (n - 1)

    j = a.join(b, "event_type")
    m_a = mean(F.col("s1_a"), F.col("n_a"))
    m_b = mean(F.col("s1_b"), F.col("n_b"))
    v_a = var(F.col("s2_a"), F.col("s1_a"), F.col("n_a"))
    v_b = var(F.col("s2_b"), F.col("s1_b"), F.col("n_b"))
    from interop_datalake_spark.functions.fixedpoint import exact_ratio

    z = (m_a - m_b) / F.sqrt(v_a / F.col("n_a") + v_b / F.col("n_b"))
    return (
        j.select(
            "event_type",
            "n_a",
            "n_b",
            # means are cents/count integer ratios: exact half-up
            # micro-units (round(double, 6) of an integer ratio can
            # land exactly half-way on the grid — ewma red-row class);
            # z stays round(irrational, 6): off-grid by construction
            exact_ratio(
                (F.col("s1_a") * 100).cast("bigint"),
                F.col("n_a") * 100,
            ).alias("mean_a"),
            exact_ratio(
                (F.col("s1_b") * 100).cast("bigint"),
                F.col("n_b") * 100,
            ).alias("mean_b"),
            F.round(z, 6).alias("z_score"),
            (F.abs(z) > 1.96).alias("significant_05"),
        )
        .orderBy("event_type")
    )


AB_TEST_ORACLE = """
WITH per_arm AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         count(*) AS n,
         sum(value::DECIMAL(12,2)) AS s1,
         sum(value::DECIMAL(12,2) * value::DECIMAL(12,2)) AS s2
  FROM events GROUP BY 1, 2
), a AS (SELECT event_type, n AS n_a, s1 AS s1_a, s2 AS s2_a
         FROM per_arm WHERE arm = 'A'),
b AS (SELECT event_type, n AS n_b, s1 AS s1_b, s2 AS s2_b
      FROM per_arm WHERE arm = 'B'),
j AS (
  SELECT a.event_type, n_a, n_b, s1_a, s1_b,
         s1_a::DOUBLE / n_a AS m_a, s1_b::DOUBLE / n_b AS m_b,
         (s2_a::DOUBLE - (s1_a::DOUBLE)^2 / n_a) / (n_a - 1) AS v_a,
         (s2_b::DOUBLE - (s1_b::DOUBLE)^2 / n_b) / (n_b - 1) AS v_b
  FROM a JOIN b USING (event_type)
)
SELECT event_type, n_a, n_b,
       ((2 * (s1_a * 100)::BIGINT * 1000000 + n_a * 100)
        // (2 * n_a * 100))::DOUBLE / 1000000.0 AS mean_a,
       ((2 * (s1_b * 100)::BIGINT * 1000000 + n_b * 100)
        // (2 * n_b * 100))::DOUBLE / 1000000.0 AS mean_b,
       round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) AS z_score,
       abs((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b)) > 1.96
         AS significant_05
FROM j ORDER BY event_type
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | type) with transition counts — the
    sequence-model analytics funnel/sessionize don't give (funnels fix
    an order; this measures ALL orders). One lag window per user (the
    only fact shuffle, keyed by user) then a count matrix bounded by
    |types|²; probabilities are exact BIGINT ratios rounded at 6 dp,
    ties impossible."""
    ev = load_table(spark, sf_dir, "events")
    return markov_transitions(ev).orderBy("from_type", "to_type")


def markov_transitions(ev: DataFrame) -> DataFrame:
    """Reusable core of :func:`events_markov_transitions`: transition
    counts + conditional probabilities over (user_id, ts, event_id,
    event_type) rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("to_type"),
            F.lag("event_type", 1).over(w).alias("from_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    from interop_datalake_spark.functions.fixedpoint import exact_ratio

    # p is an integer ratio n/n_from: exact half-up micro-units, not
    # round(double, 6) — integer ratios can land exactly half-way on
    # the 6-dp grid (the ewma red-row class)
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            exact_ratio(F.col("n"), F.col("n_from")).alias("p"),
        )
    )


MARKOV_ORACLE = """
WITH pairs AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS from_type,
         event_type AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
), totals AS (
  SELECT from_type, sum(n) AS n_from FROM counts GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n,
       ((2 * c.n * 1000000 + t.n_from::BIGINT)
        // (2 * t.n_from::BIGINT))::DOUBLE / 1000000.0 AS p
FROM counts c JOIN totals t USING (from_type)
ORDER BY from_type, to_type
"""


QUERIES = {
    "events_funnel": events_funnel,
    "events_heavy_hitters": events_heavy_hitters,
    "events_anomaly_mad": events_anomaly_mad,
    "events_quantile_rollup": events_quantile_rollup,
    "events_rolling_median": events_rolling_median,
    "events_ab_test": events_ab_test,
    "events_markov_transitions": events_markov_transitions,
    "events_distinct_rollup": events_distinct_rollup,
    "events_ewma": events_ewma,
    "events_hypertable_rollup": events_hypertable_rollup,
    "revenue_share_window": revenue_share_window,
    "events_cohort_retention": events_cohort_retention,
    "events_sessionize": events_sessionize,
}

ORACLES = {
    "events_funnel": FUNNEL_ORACLE,
    "events_distinct_rollup": DISTINCT_ROLLUP_ORACLE,
    "events_heavy_hitters": HEAVY_HITTERS_ORACLE,
    "events_anomaly_mad": ANOMALY_MAD_ORACLE,
    "events_quantile_rollup": QUANTILE_ROLLUP_ORACLE,
    "events_rolling_median": ROLLING_MEDIAN_ORACLE,
    "events_ab_test": AB_TEST_ORACLE,
    "events_markov_transitions": MARKOV_ORACLE,
    "events_ewma": EWMA_ORACLE,
    "events_hypertable_rollup": HYPERTABLE_ORACLE,
    "revenue_share_window": REVENUE_SHARE_ORACLE,
    "events_cohort_retention": COHORT_ORACLE,
    "events_sessionize": SESSIONIZE_ORACLE,
}
