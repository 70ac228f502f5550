"""Relational operator suite (SURVEY.md §2.B: scans, filters, joins,
aggregates, windows, set ops, string/date/JSON functions).

Every query here is declared with the DataFrame API so Catalyst owns
the physical strategy. Scale design notes are in each docstring; the
common rules:

- Dimension tables (region 5 / nation 25 / supplier / part) are
  explicitly ``broadcast()``-hinted: at 100 TB the fact side never
  shuffles for a dim join.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key —
  at deployment these tables should be bucketed by orderkey, which
  turns this into a shuffle-free sort-merge join. AQE handles skew.
- All money aggregates run in DECIMAL(18,2)/(18,4): decimal addition
  is associative-exact, so results are independent of partitioning and
  merge order — required for the DuckDB oracle hash and, at scale, for
  run-to-run reproducibility.
- Every top-k has a total tie-break ordering: nondeterministic limits
  are a correctness bug at any scale.

Reference parity: the reference app has no relational layer (it is a
single-table NLP pipeline; SURVEY.md §2.A), but its dead
``cosine_similarity`` import (/root/reference/nlp_data_tagging.py:10)
and the driver's TPC-H-ish tables define this envelope (§2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nlp_data_pipeline_spark.sources.catalog import load_table

D182 = "decimal(18,2)"


def _dec(col: str):
    return F.col(col).cast(D182)


def _disc_price():
    # exact decimal: extendedprice * (1 - discount); inputs are 2-dp doubles
    return _dec("l_extendedprice") * (F.lit(1).cast(D182) - _dec("l_discount"))


# --------------------------------------------------------------------------
# q01: TPC-H Q1-shaped pricing summary — groupBy + 8 aggregates.
# Scale: single scan, map-side partial agg, tiny shuffle (4 groups).
# --------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    charge = _disc_price() * (F.lit(1).cast(D182) + _dec("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02: filter + projection with IN / LIKE / BETWEEN / CASE — pushdown demo.
# Scale: all predicates reach the parquet scan (PushedFilters); projection
# prunes to 6 columns.
# --------------------------------------------------------------------------
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_size").between(10, 20)
            & F.col("p_type").isin("ECONOMY", "STANDARD", "PROMO")
            & F.col("p_name").like("%widget%")
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_size",
            F.when(F.col("p_retailprice") < 500, F.lit("budget"))
            .when(F.col("p_retailprice") < 1500, F.lit("mid"))
            .otherwise(F.lit("premium"))
            .alias("price_tier"),
            F.round(F.col("p_retailprice"), 2).alias("p_retailprice"),
        )
    )


Q02_SQL = """
SELECT p_partkey, p_name, p_brand, p_size,
       CASE WHEN p_retailprice < 500 THEN 'budget'
            WHEN p_retailprice < 1500 THEN 'mid'
            ELSE 'premium' END AS price_tier,
       round(p_retailprice, 2) AS p_retailprice
FROM part
WHERE p_size BETWEEN 10 AND 20
  AND p_type IN ('ECONOMY','STANDARD','PROMO')
  AND p_name LIKE '%widget%'
"""


# --------------------------------------------------------------------------
# q03: TPC-H Q3-shaped 3-way join + agg + top-10.
# Scale: customer filter first (pushdown), orders⋈lineitem is the big
# shuffle — bucket both by orderkey in deployment; top-k via sort+limit
# is a per-partition top-k then a tiny final merge (TakeOrderedAndProject).
# customer is SF-SCALED (not a bounded dim like region/nation), so it
# carries NO broadcast hint: Catalyst broadcasts it while its estimate
# fits (the whole driver range) and flips to a shuffled join when it
# doesn't — a forced hint here would OOM at real TPC-H scale factors
# (round-9 broadcast-hint audit).
# --------------------------------------------------------------------------
def q03_segment_revenue_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q03_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q04: EXISTS via left-semi join (TPC-H Q4 shape).
# Scale: semi join only ships the join key; no fact-row duplication.
# --------------------------------------------------------------------------
def q04_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    joined = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count")).orderBy("o_orderpriority")


Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q05: TPC-H Q5-shaped 6-way join, bounded dims broadcast.
# Scale: region (5 rows) and nation (25 rows) are BOUNDED dims — hinted
# broadcast. supplier and customer are SF-SCALED: no hints; Catalyst
# broadcasts them while small and flips to shuffled joins at scale
# (round-9 broadcast-hint audit removed a forced supplier hint that
# would OOM at real scale factors). The s_nationkey = c_nationkey
# condition is TPC-H's "local supplier" twist.
# --------------------------------------------------------------------------
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q05_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# q06: TPC-H Q6-shaped scalar filter-aggregate.
# Scale: every predicate pushes to parquet; single-row result, no shuffle
# beyond the final partial-agg merge.
# --------------------------------------------------------------------------
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q06_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q07: anti join — customers with no orders, counted per segment.
# Scale: left_anti ships only keys; no row duplication.
# --------------------------------------------------------------------------
def q07_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


Q07_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q08: ROLLUP revenue by nation × order-year.
# Scale: rollup = one shuffle with grouping-set expansion; dims broadcast.
# --------------------------------------------------------------------------
def q08_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("o_year"), _dec("o_totalprice").alias("price"))
    )
    return (
        joined.rollup("n_name", "o_year")
        .agg(F.sum("price").cast("double").alias("total_revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.asc_nulls_first("n_name"), F.asc_nulls_first("o_year"))
    )


Q08_SQL = """
SELECT n_name, o_year,
       CAST(SUM(price) AS DOUBLE) AS total_revenue,
       COUNT(*) AS n_orders
FROM (
  SELECT n_name, EXTRACT(year FROM o_orderdate)::INT AS o_year,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
) t
GROUP BY ROLLUP (n_name, o_year)
ORDER BY n_name NULLS FIRST, o_year NULLS FIRST
"""


# --------------------------------------------------------------------------
# q09: CUBE over order status × priority.
# --------------------------------------------------------------------------
def q09_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


Q09_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# --------------------------------------------------------------------------
# q10: per-group top-k via window (top 3 customers by acctbal per nation).
# Scale: row_number window = one shuffle on the partition key; with AQE
# this is the canonical scalable top-k-per-group (no global sort).
# --------------------------------------------------------------------------
def q10_topk_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("n_name", "c_custkey", "c_name", "c_acctbal", "rank_in_nation")
        .orderBy("n_name", "rank_in_nation")
    )


Q10_SQL = """
SELECT n_name, c_custkey, c_name, c_acctbal, rank_in_nation
FROM (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
  FROM customer
) t
JOIN nation ON c_nationkey = n_nationkey
WHERE rank_in_nation <= 3
ORDER BY n_name, rank_in_nation
"""


# --------------------------------------------------------------------------
# q11: running total per customer (window frame, decimal-exact).
# --------------------------------------------------------------------------
def q11_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        )
    )


Q11_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
WHERE o_custkey < 100
"""


# --------------------------------------------------------------------------
# q12: lag/lead over the events stream (per-user gaps, microsecond-exact).
# Scale: one shuffle on user_id; integer microsecond math avoids float.
# --------------------------------------------------------------------------
def q12_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros("ts")
    return (
        e.filter(F.col("user_id") < 20)
        .select(
            "event_id",
            "user_id",
            "event_type",
            (micros - F.lag(micros, 1).over(w)).alias("gap_prev_us"),
            (F.lead(micros, 1).over(w) - micros).alias("gap_next_us"),
        )
    )


Q12_SQL = """
SELECT event_id, user_id, event_type,
       epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap_prev_us,
       LEAD(epoch_us(ts), 1) OVER w - epoch_us(ts) AS gap_next_us
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------------
# q13: moving average over a bounded frame (decimal-exact).
# --------------------------------------------------------------------------
def q13_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return (
        e.filter(F.col("user_id") < 20)
        .select(
            "event_id",
            "user_id",
            (F.sum(F.col("value").cast(D182)).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
                "moving_avg_value"
            ),
        )
    )


Q13_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg_value
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# q14: set operations — INTERSECT and EXCEPT of yearly buyer cohorts.
# --------------------------------------------------------------------------
def q14_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y1995 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y1996 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both = y1995.intersect(y1996).select(F.lit("retained").alias("cohort"), "o_custkey")
    churned = y1995.exceptAll(y1996).select(F.lit("churned").alias("cohort"), "o_custkey")
    return both.unionByName(churned).groupBy("cohort").agg(F.count(F.lit(1)).alias("n_customers")).orderBy("cohort")


Q14_SQL = """
WITH y1995 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995),
     y1996 AS (SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996),
     both_y AS (SELECT 'retained' AS cohort, o_custkey FROM (SELECT o_custkey FROM y1995 INTERSECT SELECT o_custkey FROM y1996)),
     churned AS (SELECT 'churned' AS cohort, o_custkey FROM (SELECT o_custkey FROM y1995 EXCEPT SELECT o_custkey FROM y1996))
SELECT cohort, COUNT(*) AS n_customers
FROM (SELECT * FROM both_y UNION ALL SELECT * FROM churned)
GROUP BY cohort
ORDER BY cohort
"""


# --------------------------------------------------------------------------
# q15: exact distinct aggregates + HAVING.
# --------------------------------------------------------------------------
def q15_distinct_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_balance"),
        )
        .filter(F.col("n_customers") > 100)
        .orderBy("c_mktsegment")
    )


Q15_SQL = """
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY c_mktsegment
HAVING COUNT(*) > 100
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q16: string-function projection sweep.
# --------------------------------------------------------------------------
def q16_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
    ).filter(F.col("p_partkey") < 500)


Q16_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 4) AS name_prefix,
       coalesce(regexp_extract(p_name, '^(\\w+)', 1), '') AS first_word,
       concat_ws('|', p_brand, p_type) AS brand_type,
       length(p_name) AS name_len,
       len(string_split(p_name, ' ')) AS n_words,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
WHERE p_partkey < 500
"""


# --------------------------------------------------------------------------
# q17: date/time functions over events.
# Scale: date_trunc groupBy = the partition-pruning-friendly layout key
# for time-series data (deploy: partition events by date).
# --------------------------------------------------------------------------
def q17_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.dayofweek("ts").alias("dow_sunday1"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(D182)).cast("double").alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("day")
    )


Q17_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       (dayofweek(ts) + 1)::INT AS dow_sunday1,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY 1, 2
ORDER BY day
"""


# --------------------------------------------------------------------------
# q18: JSON extraction from events.props ({"k": int}).
# --------------------------------------------------------------------------
def q18_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        e.select((k % 10).alias("k_mod10"), k.alias("k"))
        .groupBy("k_mod10")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
        )
        .orderBy("k_mod10")
    )


Q18_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod10,
       COUNT(*) AS n_events,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY 1
ORDER BY k_mod10
"""


# --------------------------------------------------------------------------
# q19: as-of join — for each purchase, the latest signup of the same user
# at-or-before it. Spark-first implementation: union + last_value window
# (a single shuffle on user_id, linear in events — NO range cross-join,
# which is the trap that explodes at 100 TB).
# DuckDB oracle uses its native ASOF JOIN.
# --------------------------------------------------------------------------
def q19_asof_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    flagged = e.filter(F.col("event_type").isin("signup", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts_raw"),
    )
    # order signups before purchases at identical ts so '<=' semantics hold
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.when(F.col("event_type") == "signup", 0).otherwise(1), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("last_signup_ts", F.last("signup_ts_raw", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "last_signup_ts")
    )


Q19_SQL = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, s.ts AS last_signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


# --------------------------------------------------------------------------
# q20: range self-join — pairs of events by the same user within 5 minutes.
# Scale note: bounded-range self-join; Spark executes as a shuffle join on
# user_id with the range predicate post-filtered. At 100 TB you'd bucket
# by (user_id, time-bucket) so candidate pairs stay within a partition.
# --------------------------------------------------------------------------
def q20_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy("user_id")
    )


Q20_SQL = """
SELECT a.user_id AS user_id, COUNT(*) AS pair_count
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY a.user_id
ORDER BY user_id
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_segment_revenue_top10": q03_segment_revenue_top10,
    "q04_priority_semijoin": q04_priority_semijoin,
    "q05_regional_revenue": q05_regional_revenue,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q07_customers_without_orders": q07_customers_without_orders,
    "q08_rollup_nation_year": q08_rollup_nation_year,
    "q09_cube_status_priority": q09_cube_status_priority,
    "q10_topk_customers_per_nation": q10_topk_customers_per_nation,
    "q11_running_total": q11_running_total,
    "q12_event_gaps": q12_event_gaps,
    "q13_moving_avg": q13_moving_avg,
    "q14_cohort_set_ops": q14_cohort_set_ops,
    "q15_distinct_having": q15_distinct_having,
    "q16_string_funcs": q16_string_funcs,
    "q17_date_funcs": q17_date_funcs,
    "q18_json_funcs": q18_json_funcs,
    "q19_asof_signup_before_purchase": q19_asof_signup_before_purchase,
    "q20_range_join_pairs": q20_range_join_pairs,
}

ORACLES = {
    "q01_pricing_summary": Q01_SQL,
    "q02_filter_project": Q02_SQL,
    "q03_segment_revenue_top10": Q03_SQL,
    "q04_priority_semijoin": Q04_SQL,
    "q05_regional_revenue": Q05_SQL,
    "q06_forecast_revenue": Q06_SQL,
    "q07_customers_without_orders": Q07_SQL,
    "q08_rollup_nation_year": Q08_SQL,
    "q09_cube_status_priority": Q09_SQL,
    "q10_topk_customers_per_nation": Q10_SQL,
    "q11_running_total": Q11_SQL,
    "q12_event_gaps": Q12_SQL,
    "q13_moving_avg": Q13_SQL,
    "q14_cohort_set_ops": Q14_SQL,
    "q15_distinct_having": Q15_SQL,
    "q16_string_funcs": Q16_SQL,
    "q17_date_funcs": Q17_SQL,
    "q18_json_funcs": Q18_SQL,
    "q19_asof_signup_before_purchase": Q19_SQL,
    "q20_range_join_pairs": Q20_SQL,
}
