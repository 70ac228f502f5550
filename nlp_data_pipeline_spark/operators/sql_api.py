"""spark.sql() API surface — the engine's second front door.

Everything else in this repo uses the DataFrame DSL; these queries go
through SQL text + temp views to prove the whole surface (views, CTEs,
subqueries, UDTF registration) works identically — same Catalyst plans
underneath, so no scale caveats beyond the DSL twins'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nlp_data_pipeline_spark.sources.catalog import register_views


# --------------------------------------------------------------------------
# v01: pure-SQL analytics over registered views (CTE + subquery + join).
# Customers whose lifetime spend exceeds 2× their segment's average.
# --------------------------------------------------------------------------
def v01_sql_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH spend AS (
          SELECT c.c_custkey, c.c_mktsegment,
                 CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime
          FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey, c.c_mktsegment
        ),
        seg AS (
          SELECT c_mktsegment, CAST(SUM(lifetime) AS DOUBLE) / COUNT(*) AS seg_avg
          FROM spend GROUP BY c_mktsegment
        )
        SELECT s.c_custkey, s.c_mktsegment,
               ROUND(s.lifetime, 2) AS lifetime,
               ROUND(s.lifetime / g.seg_avg, 4) AS vs_segment
        FROM spend s JOIN seg g ON s.c_mktsegment = g.c_mktsegment
        WHERE s.lifetime > 2 * g.seg_avg
        ORDER BY s.c_mktsegment, s.c_custkey
        """
    )


V01_SQL = """
WITH spend AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
),
seg AS (
  SELECT c_mktsegment, CAST(SUM(lifetime) AS DOUBLE) / COUNT(*) AS seg_avg
  FROM spend GROUP BY c_mktsegment
)
SELECT s.c_custkey, s.c_mktsegment,
       ROUND(s.lifetime, 2) AS lifetime,
       ROUND(s.lifetime / g.seg_avg, 4) AS vs_segment
FROM spend s JOIN seg g ON s.c_mktsegment = g.c_mktsegment
WHERE s.lifetime > 2 * g.seg_avg
ORDER BY s.c_mktsegment, s.c_custkey
"""


# --------------------------------------------------------------------------
# v02: correlated scalar subquery — each part vs the average retail
# price of its brand.
# --------------------------------------------------------------------------
def v02_sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part p1
        WHERE p_retailprice > 1.5 * (
          SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM part p2 WHERE p2.p_brand = p1.p_brand
        )
        ORDER BY p_brand, p_partkey
        """
    )


V02_SQL = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p1
WHERE p_retailprice > 1.5 * (
  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM part p2 WHERE p2.p_brand = p1.p_brand
)
ORDER BY p_brand, p_partkey
"""


# --------------------------------------------------------------------------
# v03: Python UDTF (Spark 3.5+) — a table function exploding text into
# (pos, sentence) rows. UDTFs are the slow path (row-at-a-time Python),
# kept OUT of hot pipelines; registered here to cover the API. The
# oracle reproduces the same split in SQL.
# --------------------------------------------------------------------------
def v03_sentence_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):  # noqa: A002
            for i, s in enumerate(re.split(r"[.!?]+", text or "")):
                s = s.strip()
                if len(s) > 10:
                    yield i, s

    spark.udtf.register("sentence_split", SentenceSplit)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, CAST(length(s.sentence) AS BIGINT) AS sent_len
        FROM documents d,
             LATERAL sentence_split(d.doc_id, substring(d.text, 1, 80)) s
        WHERE d.doc_id < 50
        ORDER BY d.doc_id, s.pos
        """
    )


V03_SQL = """
SELECT doc_id, pos, length(sentence) AS sent_len
FROM (
  SELECT doc_id,
         (u.i - 1)::INT AS pos,
         trim(parts[u.i]) AS sentence
  FROM (
    SELECT doc_id, string_split_regex(substring(text, 1, 80), '[.!?]+') AS parts
    FROM documents WHERE doc_id < 50
  ) t, (SELECT unnest(range(1, 100)) AS i) u
  WHERE u.i <= len(parts)
) z
WHERE length(sentence) > 10
ORDER BY doc_id, pos
"""


# --------------------------------------------------------------------------
# v04: explicit GROUPING SETS — the general form of q08's ROLLUP /
# q09's CUBE: exactly the named aggregation levels, nothing more.
# One shuffle with grouping-set expansion (each input row contributes
# to each matching set).
# --------------------------------------------------------------------------
def v04_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus), (c_mktsegment), (o_orderstatus))
        ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST
        """
    )


V04_SQL = """
SELECT c_mktsegment, o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus), (c_mktsegment), (o_orderstatus))
ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST
"""


QUERIES = {
    "v01_sql_big_spenders": v01_sql_big_spenders,
    "v02_sql_correlated_subquery": v02_sql_correlated_subquery,
    "v03_sentence_udtf": v03_sentence_udtf,
    "v04_grouping_sets": v04_grouping_sets,
}

ORACLES = {
    "v04_grouping_sets": V04_SQL,
    "v01_sql_big_spenders": V01_SQL,
    "v02_sql_correlated_subquery": V02_SQL,
    "v03_sentence_udtf": V03_SQL,
}
