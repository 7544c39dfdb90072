"""TPC-H decision-support shapes — the join/subquery breadth tier.

The reference's relational surface is narrow (SURVEY.md §2.E: one
equi-join, one union); a drop-in engine needs the full decision-support
join/subquery repertoire. This module carries the remaining classic
TPC-H query shapes (Q1/Q3/Q5/Q14/Q17/Q19 live in relational.py),
re-keyed to the driver's tables — the testdata has no partsupp, so the
part↔supplier link is derived from lineitem, and receipt/commit dates
are replaced by ship-vs-order-date lateness.

Scale posture per query (the 100 TB question is always "what shuffles?"):
dimension sides (region/nation/supplier/customer-after-filter) are
broadcast; the only wide shuffles are fact-fact joins on their natural
key (lineitem⋈orders on orderkey) and the final small aggregations.
Money math follows functions/stable.py: exact integer cents/1e-4ths
summed associatively, one float division at the end, so Spark and the
DuckDB oracle agree bit-for-bit.

Reference anchors: join+agg style per `Main.scala:250` (inner join) and
`Main.scala:65-68` (grouped sum); everything else is engine surface the
reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import scaled_long
from ..sources.tables import load_table
from . import register

_REV_S = "10000"  # revenue scale: 1e-4ths


def _rev_s() -> F.Column:
    return scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)


# --- Q4 shape: order-priority check — EXISTS decorrelated to a left-semi
# join. The semi join carries the non-equi lateness predicate alongside
# the orderkey equi-key, so it still plans as a keyed join (one shuffle
# of each side), not a nested loop. ----------------------------------------


@register(
    "order_priority_check",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 90)
GROUP BY o_orderpriority
""".strip(),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        F.to_date(li.l_shipdate) > F.date_add(F.to_date(o.o_orderdate), 90)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
    )


# --- Q6 shape: forecast revenue change — pure scan+filter+agg; every
# predicate (date band, discount band, quantity cap) must reach the
# parquet scan as PushedFilters. -------------------------------------------


@register(
    "forecast_revenue_change",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT))
       AS DOUBLE) / 10000.0, 4) AS revenue_increase,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24
""".strip(),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate").between("1996-01-01", "1996-12-31")
        & F.col("l_discount").between(0.04, 0.08)
        & (F.col("l_quantity") < 24)
    )
    inc_s = scaled_long(F.col("l_extendedprice") * F.col("l_discount"), 10_000)
    return li.agg(
        F.round(F.sum(inc_s).cast("double") / 10_000.0, 4).alias(
            "revenue_increase"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- Q7 shape: volume shipping between two nations — supplier nation on
# the lineitem side, customer nation on the orders side. Both nation
# filters are applied BEFORE the fact-fact join (broadcast semi-filter
# through supplier/customer), so the one wide shuffle (lineitem⋈orders
# on orderkey) moves only the ~2/25ths of each fact that can match. --------


@register(
    "volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS INT) AS ship_year,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
             AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_6','NATION_7') AND n2.n_name IN ('NATION_6','NATION_7')
  AND n1.n_name <> n2.n_name
GROUP BY supp_nation, cust_nation, ship_year
""".strip(),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = ("NATION_6", "NATION_7")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey
    )
    o = load_table(spark, sf_dir, "orders").join(
        F.broadcast(cust), F.col("o_custkey") == cust.c_custkey
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev_s()).cast("double") / 10_000.0, 4).alias("revenue"))
    )


# --- Q8 shape: national market share — one conditional aggregate gives
# numerator and denominator in a single pass over the region-restricted
# market (no self-join, no second scan). -----------------------------------


@register(
    "national_market_share",
    oracle="""
WITH m AS (
  SELECT CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INT) AS order_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS rev_s,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'EUROPE')
SELECT order_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev_s ELSE 0 END)
             AS DOUBLE) / CAST(SUM(rev_s) AS DOUBLE), 6) AS mkt_share
FROM m GROUP BY order_year
""".strip(),
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cust_eu = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = load_table(spark, sf_dir, "orders").join(
        F.broadcast(cust_eu), F.col("o_custkey") == cust_eu.c_custkey
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey
    )
    m = li.join(o, li.l_orderkey == o.o_orderkey)
    rev = _rev_s()
    nat_rev = F.sum(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(F.lit(0)))
    return m.groupBy(
        F.year(F.to_date("o_orderdate")).alias("order_year")
    ).agg(
        F.round(
            nat_rev.cast("double") / F.sum(rev).cast("double"), 6
        ).alias("mkt_share")
    )


# --- Q9 shape: product-type profit — profit proxy uses p_retailprice at
# a 0.8 cost factor (the testdata has no partsupp.ps_supplycost). Part
# is filtered to one type BEFORE the broadcast, so the lineitem scan is
# pruned by the join (runtime bloom/DPP at scale). All money in exact
# 1e-4ths: 0.8·p_retailprice·1e4 = p_retailprice·8000, integral for a
# 2-dp price. ---------------------------------------------------------------


@register(
    "product_type_profit",
    oracle="""
SELECT n.n_name AS supp_nation,
       CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INT) AS order_year,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
             AS BIGINT)
           - CAST(ROUND(p.p_retailprice * 8000) AS BIGINT)
             * CAST(ROUND(l.l_quantity) AS BIGINT)) AS DOUBLE) / 10000.0, 4)
         AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_type = 'ECONOMY'
GROUP BY supp_nation, order_year
""".strip(),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nat = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit_s = _rev_s() - scaled_long(F.col("p_retailprice"), 8_000) * scaled_long(
        F.col("l_quantity"), 1
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "supp_nation", F.year(F.to_date("o_orderdate")).alias("order_year")
        )
        .agg(
            F.round(F.sum(profit_s).cast("double") / 10_000.0, 4).alias("profit")
        )
    )


# --- Q10 shape: returned-item reporting — per-customer lost revenue in
# one quarter, top 20. The quarter filter lands on the orders scan, so
# the orders side of the fact-fact join is already tiny; the final top-k
# is TakeOrderedAndProject (per-partition heaps, no global sort). ----------


@register(
    "returned_item_reporting",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(c.c_acctbal, 2) AS c_acctbal,
       ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
             AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1996-07-01' AND DATE '1996-09-30'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey LIMIT 20
""".strip(),
)
def returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate").between("1996-07-01", "1996-09-30")
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .agg(F.round(F.sum(_rev_s()).cast("double") / 10_000.0, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- Q11 shape: important part concentration — per-part revenue kept
# only where it exceeds 0.08% of the grand total. The per-part aggregate
# is persisted and reused for the grand total (one lineitem scan, one
# shuffle); the comparison is integer-only (rev·1250 > total), so no
# float threshold wobble between engines. ----------------------------------


@register(
    "part_revenue_share",
    oracle="""
WITH pr AS (
  SELECT l_partkey, SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
         AS BIGINT)) AS rev_s
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey,
       ROUND(CAST(rev_s AS DOUBLE) / 10000.0, 4) AS revenue
FROM pr
WHERE rev_s * 1250 > (SELECT SUM(rev_s) FROM pr)
""".strip(),
)
def part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # No persist: the aggregate feeds both branches via ReuseExchange
    # (identical subplans share the one shuffle), and a persist here
    # would leak cached partitions — the query function never sees its
    # result materialized, so it has nowhere to unpersist.
    pr = li.groupBy("l_partkey").agg(F.sum(_rev_s()).alias("rev_s"))
    total = pr.agg(F.sum("rev_s").alias("total_s"))
    return (
        pr.crossJoin(F.broadcast(total))
        .where(F.col("rev_s") * 1250 > F.col("total_s"))
        .select(
            "l_partkey",
            F.round(F.col("rev_s").cast("double") / 10_000.0, 4).alias("revenue"),
        )
    )


# --- Q13 shape: customer order-count distribution — the left outer join
# keeps never-ordered customers (count 0); two aggregation levels, the
# second over at-most-|distinct counts| rows. ------------------------------


@register(
    "customer_distribution",
    oracle="""
WITH co AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
""".strip(),
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- Q15 shape: top supplier — quarterly per-supplier revenue, keep the
# max. Max comes off the (|suppliers|-row) aggregate via a reused
# exchange, not a rescan; integer equality avoids float-max ties. ----------


@register(
    "top_supplier_revenue",
    oracle="""
WITH sr AS (
  SELECT l_suppkey, SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
         AS BIGINT)) AS rev_s
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name,
       ROUND(CAST(sr.rev_s AS DOUBLE) / 10000.0, 4) AS total_revenue
FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
WHERE sr.rev_s = (SELECT MAX(rev_s) FROM sr)
""".strip(),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate").between("1996-01-01", "1996-03-31")
    )
    # No persist (see part_revenue_share): ReuseExchange shares the
    # aggregate's shuffle between the max branch and the probe branch.
    sr = li.groupBy("l_suppkey").agg(F.sum(_rev_s()).alias("rev_s"))
    mx = sr.agg(F.max("rev_s").alias("max_s"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        sr.crossJoin(F.broadcast(mx))
        .where(F.col("rev_s") == F.col("max_s"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_s").cast("double") / 10_000.0, 4).alias(
                "total_revenue"
            ),
        )
    )


# --- Q16 shape: supplier diversity per part class — COUNT(DISTINCT
# suppkey) per (brand, type, size) with the part↔supplier link coming
# from lineitem; the distinct-agg expands then reduces on the group key
# (two-phase, no global funnel). --------------------------------------------


@register(
    "parts_supplier_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 10, 20, 30, 45)
  AND s.s_acctbal >= 0
GROUP BY p.p_brand, p.p_type, p.p_size
""".strip(),
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 10, 20, 30, 45)
    )
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") >= 0)
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q18 shape: large-volume orders — group-by-having on the fact, then
# enrich. The HAVING output is tiny, so both enrichment joins broadcast
# it; quantities in exact centi-units. --------------------------------------


@register(
    "large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_s
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       ROUND(CAST(big.qty_s AS DOUBLE) / 100.0, 2) AS total_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""".strip(),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(scaled_long(F.col("l_quantity"), 100)).alias("qty_s"))
        .where(F.col("qty_s") > 25_000)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # Broadcast the HAVING output into orders, then broadcast that
    # (still tiny) join result into customer — customer is fact-scale
    # at the target SF and must stay on the probe side, never hinted.
    oj = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
    return (
        c.join(F.broadcast(oj), oj.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round(F.col("qty_s").cast("double") / 100.0, 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# --- Q20 shape: dominant-supplier parts — nested aggregation: per
# (part, supplier) 1996 volume, window-totaled per part (hash-partitioned
# by partkey — no global funnel), then per-supplier count of parts where
# that supplier shipped a strict majority among ≥2 suppliers. --------------


@register(
    "dominant_supplier_parts",
    oracle="""
WITH pq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sq,
         SUM(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)))
           OVER (PARTITION BY l_partkey) AS tq,
         COUNT(*) OVER (PARTITION BY l_partkey) AS nsupp
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
  GROUP BY l_partkey, l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
FROM pq JOIN supplier s ON pq.l_suppkey = s.s_suppkey
WHERE pq.nsupp >= 2 AND pq.sq * 2 > pq.tq
GROUP BY s.s_suppkey, s.s_name
""".strip(),
)
def dominant_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate").between("1996-01-01", "1996-12-31")
    )
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(scaled_long(F.col("l_quantity"), 100)).alias("sq")
    )
    w = Window.partitionBy("l_partkey")
    pq = pq.withColumn("tq", F.sum("sq").over(w)).withColumn(
        "nsupp", F.count(F.lit(1)).over(w)
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        pq.where((F.col("nsupp") >= 2) & (F.col("sq") * 2 > F.col("tq")))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


# --- Q21 shape: suppliers who kept orders waiting — the reference SQL is
# a double EXISTS/NOT-EXISTS correlated pair; here it decorrelates into
# ONE grouped pass per order (distinct suppliers, distinct late
# suppliers, the sole late supplier via MAX over a guarded key), then a
# per-supplier count. One lineitem⋈orders shuffle, one tiny re-agg. --------


@register(
    "waiting_orders_blame",
    oracle="""
WITH per_order AS (
  SELECT l.l_orderkey,
         COUNT(DISTINCT l.l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN CAST(l.l_shipdate AS DATE)
               > CAST(o.o_orderdate AS DATE) + 60 THEN l.l_suppkey END) AS n_late,
         MAX(CASE WHEN CAST(l.l_shipdate AS DATE)
             > CAST(o.o_orderdate AS DATE) + 60 THEN l.l_suppkey END) AS late_supp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order po JOIN supplier s ON po.late_supp = s.s_suppkey
WHERE po.n_supp >= 2 AND po.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name LIMIT 10
""".strip(),
)
def waiting_orders_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
    late_key = F.when(late, F.col("l_suppkey"))
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(li.l_orderkey)
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_key).alias("n_late"),
            F.max(late_key).alias("late_supp"),
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# --- Q22 shape: global sales opportunity — above-average balance AND no
# recent orders. The average test is integer-exact (bal·n > Σbal, no
# float threshold); the "no recent orders" is a left-anti join against
# the date-pruned orders scan. ----------------------------------------------


@register(
    "global_sales_opportunity",
    oracle="""
WITH pos AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0)
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS totacctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * (SELECT n FROM pos)
      > (SELECT s FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY n.n_name
""".strip(),
)
def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal_s = scaled_long(F.col("c_acctbal"), 100)
    pos = c.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_s).alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.to_date("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        .select("o_custkey")
    )
    nat = load_table(spark, sf_dir, "nation")
    return (
        c.crossJoin(F.broadcast(pos))
        .where(bal_s * F.col("n") > F.col("s"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(bal_s).cast("double") / 100.0, 2).alias("totacctbal"),
        )
    )


# --- Q2 shape: best-value supplier per part — the correlated MIN
# subquery decorrelated as a per-part window min over the lineitem-
# derived (part, supplier, price) offers; ties broken to the lowest
# suppkey so the answer is engine-independent. ------------------------------


@register(
    "best_value_supplier",
    oracle="""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS best_s
  FROM lineitem GROUP BY l_partkey, l_suppkey),
ranked AS (
  SELECT l_partkey, l_suppkey, best_s,
         MIN(best_s) OVER (PARTITION BY l_partkey) AS part_min
  FROM offers)
SELECT r.l_partkey, MIN(r.l_suppkey) AS best_suppkey,
       ROUND(CAST(MIN(r.best_s) AS DOUBLE) / 10000.0, 4) AS best_price
FROM ranked r
WHERE r.best_s = r.part_min AND r.l_partkey < 200
GROUP BY r.l_partkey
""".strip(),
)
def best_value_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 200)
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_rev_s()).alias("best_s")
    )
    w = Window.partitionBy("l_partkey")
    ranked = offers.withColumn("part_min", F.min("best_s").over(w))
    return (
        ranked.where(F.col("best_s") == F.col("part_min"))
        .groupBy("l_partkey")
        .agg(
            F.min("l_suppkey").alias("best_suppkey"),
            F.round(F.min("best_s").cast("double") / 10_000.0, 4).alias(
                "best_price"
            ),
        )
    )


# --- star-schema flatten for feature export --------------------------------
# The denormalization pass a training-data export runs before writing
# wide feature rows: fact (lineitem) ⋈ orders on the order key — the
# one fact-fact shuffle, both sides bucketable on o_orderkey in a real
# deployment — then customer → nation → region resolved through
# BROADCAST joins (each dim orders of magnitude under the fact), plus
# derived revenue and date features computed in the same projection.
# Catalyst pushes the column pruning into all five scans: the wide
# output never materializes columns the projection doesn't name.

@register(
    "lineitem_star_flatten",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber,
       CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
         AS revenue_cents,
       CAST(l.l_quantity AS BIGINT) AS quantity,
       CAST(o.o_orderdate AS DATE) AS order_date,
       CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS BIGINT) AS ship_lag_days,
       o.o_orderpriority,
       c.c_mktsegment,
       n.n_name AS nation,
       r.r_name AS region
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""".strip(),
)
def lineitem_star_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long").alias("revenue_cents"),
        F.col("l_quantity").cast("long").alias("quantity"),
        F.to_date("l_shipdate").alias("_ship"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("order_date"),
        "o_orderpriority",
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "revenue_cents",
            "quantity",
            "order_date",
            F.datediff(F.col("_ship"), F.col("order_date"))
            .cast("long")
            .alias("ship_lag_days"),
            "o_orderpriority",
            "c_mktsegment",
            "nation",
            "region",
        )
    )


# --- supplier scorecard (multi-metric report + global rank) -----------------
# The one-stop supplier health row a procurement dashboard reads:
# revenue, return rate, and average ship lag from ONE lineitem⋈orders
# pass (conditional aggregates, exact integer cents / day counts), plus
# the supplier's GLOBAL revenue rank from the distributed rank
# machinery (operators/rank.py — range partition + P-row offsets,
# never a bare ORDER BY window). Ratios emit as exact integer
# numerator/denominator pairs alongside the one double division, so
# the oracle comparison is bitwise.

@register(
    "supplier_scorecard",
    oracle="""
WITH f AS (
  SELECT l.l_suppkey AS suppkey,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS cents,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
agg AS (
  SELECT suppkey,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(ret) AS BIGINT) AS n_returned,
         CAST(SUM(lag_days) AS BIGINT) AS sum_lag_days
  FROM f GROUP BY suppkey)
SELECT suppkey, revenue_cents, n_items, n_returned,
       CAST(n_returned AS DOUBLE) / n_items AS return_rate,
       CAST(sum_lag_days AS DOUBLE) / n_items AS avg_lag_days,
       CAST(RANK() OVER (ORDER BY revenue_cents DESC, suppkey)
            AS BIGINT) AS revenue_rank
FROM agg
""".strip(),
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import with_global_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_suppkey").alias("suppkey"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).cast("long").alias("cents"),
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
        F.to_date("l_shipdate").alias("ship_d"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("order_d")
    )
    f = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "suppkey",
        "cents",
        "ret",
        F.datediff("ship_d", "order_d").cast("long").alias("lag_days"),
    )
    agg = f.groupBy("suppkey").agg(
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("ret").cast("long").alias("n_returned"),
        F.sum("lag_days").cast("long").alias("sum_lag_days"),
    )
    ranked = with_global_rank(
        agg,
        [F.col("revenue_cents").desc(), F.col("suppkey").asc()],
        rank_col="revenue_rank",
    )
    return ranked.select(
        "suppkey",
        "revenue_cents",
        "n_items",
        "n_returned",
        (F.col("n_returned").cast("double") / F.col("n_items")).alias(
            "return_rate"
        ),
        (F.col("sum_lag_days").cast("double") / F.col("n_items")).alias(
            "avg_lag_days"
        ),
        F.col("revenue_rank").cast("long").alias("revenue_rank"),
    )
